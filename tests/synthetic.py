"""Synthetic dataset generation for integration tests (reference analog:
nnunetv2/dataset_conversion/datasets_for_integration_tests)."""
import json
import os

import numpy as np

from anatomask_tpu.imageio.nifti import write_nifti


def make_synthetic_dataset(
    root: str,
    dataset_name: str = "Dataset901_Synth",
    num_cases: int = 6,
    shape=(28, 30, 26),
    spacing=(1.0, 1.0, 1.0),
    num_labels: int = 2,
    modality: str = "CT",
    seed: int = 0,
    with_ignore: bool = False,
):
    """Creates <root>/<dataset_name>/{imagesTr,labelsTr} with blob segmentations.
    Returns (raw_dataset_dir, dataset_json)."""
    rng = np.random.RandomState(seed)
    ds_dir = os.path.join(root, dataset_name)
    os.makedirs(os.path.join(ds_dir, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(ds_dir, "labelsTr"), exist_ok=True)
    os.makedirs(os.path.join(ds_dir, "imagesTs"), exist_ok=True)

    for i in range(num_cases):
        img = np.zeros(shape, dtype=np.float32)
        seg = np.zeros(shape, dtype=np.uint8)
        # nonzero body: central box (so crop_to_nonzero bites)
        sl = tuple(slice(2, s - 2) for s in shape)
        img[sl] = rng.rand(*[s - 4 for s in shape]) * 100 + 50
        # blobs per label
        zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        for lab in range(1, num_labels + 1):
            c = [rng.randint(6, s - 6) for s in shape]
            r = rng.randint(3, 6)
            blob = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 < r ** 2
            seg[blob] = lab
            img[blob] += 100 * lab
        if with_ignore:
            seg[:, :, : shape[2] // 4] = num_labels + 1
        name = f"case_{i:03d}"
        write_nifti(os.path.join(ds_dir, "imagesTr", f"{name}_0000.nii.gz"),
                    img.transpose(2, 1, 0), spacing_xyz=spacing[::-1])
        write_nifti(os.path.join(ds_dir, "labelsTr", f"{name}.nii.gz"),
                    seg.transpose(2, 1, 0), spacing_xyz=spacing[::-1])

    labels = {"background": 0}
    for lab in range(1, num_labels + 1):
        labels[f"class{lab}"] = lab
    if with_ignore:
        labels["ignore"] = num_labels + 1
    dataset_json = {
        "channel_names": {"0": modality},
        "labels": labels,
        "numTraining": num_cases,
        "file_ending": ".nii.gz",
    }
    with open(os.path.join(ds_dir, "dataset.json"), "w") as f:
        json.dump(dataset_json, f)
    return ds_dir, dataset_json


def setup_env(tmp_path):
    """Point ATK_raw/preprocessed/results into tmp_path; returns the three dirs."""
    raw = os.path.join(str(tmp_path), "raw")
    pp = os.path.join(str(tmp_path), "preprocessed")
    res = os.path.join(str(tmp_path), "results")
    for d in (raw, pp, res):
        os.makedirs(d, exist_ok=True)
    os.environ["ATK_raw"] = raw
    os.environ["ATK_preprocessed"] = pp
    os.environ["ATK_results"] = res
    from anatomask_tpu import paths
    paths.refresh()
    return raw, pp, res
