"""BraTS-style dataset converter (region-based labels + label remap).

Capability parity: /root/reference/nnunetv2/dataset_conversion/
Dataset137_BraTS21.py — the representative per-dataset converter with a label
remap: BraTS ships 4 modalities per case (t1, t1ce, t2, flair) and labels
{0: bg, 1: necrotic, 2: edema, 4: enhancing}; nnU-Net-style training uses
consecutive labels {0,1,2,3} (4 -> 3) and region-based heads (whole=1+2+3,
core=1+3, enhancing=3).
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, Optional

import numpy as np

from anatomask_tpu.dataset_conversion.generate_dataset_json import generate_dataset_json
from anatomask_tpu.imageio.nifti import read_nifti, write_nifti
from anatomask_tpu.paths import require

BRATS_MODALITIES = ("t1", "t1ce", "t2", "flair")


def remap_brats_labels(seg: np.ndarray) -> np.ndarray:
    """{0,1,2,4} -> {0,1,2,3} (enhancing 4 -> 3)."""
    out = seg.copy()
    out[seg == 4] = 3
    return out


def convert_brats_dataset(
    source_folder: str,
    dataset_id: int = 137,
    dataset_name: str = "BraTS",
    use_regions: bool = True,
) -> str:
    """source_folder: per-case subfolders '<case>/' containing
    '<case>_{t1,t1ce,t2,flair}.nii.gz' + '<case>_seg.nii.gz'."""
    name = f"Dataset{dataset_id:03d}_{dataset_name}"
    out = os.path.join(require("raw"), name)
    os.makedirs(os.path.join(out, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(out, "labelsTr"), exist_ok=True)

    cases = sorted(
        d for d in os.listdir(source_folder)
        if os.path.isdir(os.path.join(source_folder, d))
    )
    n = 0
    for case in cases:
        cdir = os.path.join(source_folder, case)
        seg_file = os.path.join(cdir, f"{case}_seg.nii.gz")
        if not os.path.isfile(seg_file):
            continue
        for c, mod in enumerate(BRATS_MODALITIES):
            shutil.copy(os.path.join(cdir, f"{case}_{mod}.nii.gz"),
                        os.path.join(out, "imagesTr", f"{case}_{c:04d}.nii.gz"))
        seg, hdr = read_nifti(seg_file)
        write_nifti(os.path.join(out, "labelsTr", f"{case}.nii.gz"),
                    remap_brats_labels(seg).astype(np.uint8), header=hdr)
        n += 1

    channel_names = {str(i): m.upper() for i, m in enumerate(BRATS_MODALITIES)}
    if use_regions:
        labels = {"background": 0, "whole_tumor": (1, 2, 3), "tumor_core": (1, 3),
                  "enhancing_tumor": 3}
        regions = (1, 2, 3)
    else:
        labels = {"background": 0, "necrosis": 1, "edema": 2, "enhancing": 3}
        regions = None
    generate_dataset_json(out, channel_names, labels, n, ".nii.gz",
                          regions_class_order=regions, dataset_name=name)
    return out
