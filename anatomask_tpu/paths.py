"""Dataset directory conventions.

Capability parity: /root/reference/nnunetv2/paths.py:21-23. We honor both the
ATK_* names and the nnUNet_* names so existing nnU-Net directory trees (raw /
preprocessed / results) remain usable as-is.
"""
import os


def _env(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return default


atk_raw = _env("ATK_raw", "nnUNet_raw")
atk_preprocessed = _env("ATK_preprocessed", "nnUNet_preprocessed")
atk_results = _env("ATK_results", "nnUNet_results")


def refresh():
    """Re-read the environment (tests mutate os.environ)."""
    global atk_raw, atk_preprocessed, atk_results
    atk_raw = _env("ATK_raw", "nnUNet_raw")
    atk_preprocessed = _env("ATK_preprocessed", "nnUNet_preprocessed")
    atk_results = _env("ATK_results", "nnUNet_results")
    return atk_raw, atk_preprocessed, atk_results


def require(which: str) -> str:
    refresh()
    val = {"raw": atk_raw, "preprocessed": atk_preprocessed, "results": atk_results}[which]
    if val is None:
        raise RuntimeError(
            f"Path for '{which}' data is not set. Export ATK_{which} (or nnUNet_{which})."
        )
    return val
