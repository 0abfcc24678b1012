"""Global configuration constants.

Capability parity: /root/reference/nnunetv2/configuration.py:1-12 (default process
counts, anisotropy threshold). Values are framework-level defaults, overridable by
environment variables.
"""
import os

# Number of host worker processes for CPU-bound stages (preprocessing, export).
default_num_processes = int(os.environ.get("ATK_DEF_N_PROC", os.environ.get("nnUNet_def_n_proc", 8)))

# Spacing ratio above which an axis is treated as anisotropic (separate-z resampling,
# dummy-2D augmentation gating, planner target-spacing override).
ANISO_THRESHOLD = 3

# Host->device prefetch depth for the input pipeline.
default_prefetch_depth = int(os.environ.get("ATK_PREFETCH_DEPTH", 2))


def get_allowed_n_proc_DA() -> int:
    """Number of host processes for data loading/augmentation-adjacent work.

    The heavy augmentation itself runs fused on-device (unlike the reference,
    which burns 12+ CPU processes in batchgenerators workers); host workers only
    gather memory-mapped patches.
    """
    if "ATK_N_PROC_DA" in os.environ:
        return int(os.environ["ATK_N_PROC_DA"])
    if "nnUNet_n_proc_DA" in os.environ:
        return int(os.environ["nnUNet_n_proc_DA"])
    try:
        n = len(os.sched_getaffinity(0))
    except AttributeError:
        n = os.cpu_count() or 8
    return max(1, min(12, n - 2))
