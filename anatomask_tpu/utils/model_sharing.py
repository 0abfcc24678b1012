"""Model export/import as zip archives.

Capability parity: /root/reference/nnunetv2/model_sharing/ (model_export.py zip
export of trained model folders incl. fold checkpoints, plans, dataset.json,
postprocessing decisions; model_import.py install-from-zip into the results
tree; entry_points.py download helper).
"""
from __future__ import annotations

import os
import zipfile
from typing import List, Optional, Sequence, Union

from anatomask_tpu.paths import require
from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name


_KEEP_FILES = ("plans.json", "dataset.json", "postprocessing.json",
               "inference_information.json")
_CKPT_NAMES = ("checkpoint_final.npz", "checkpoint_best.npz")


def export_pretrained_model(
    dataset_name_or_id,
    output_file: str,
    trainer: str = "ATKTrainer",
    plans_identifier: str = "ATKPlans",
    configurations: Sequence[str] = ("3d_fullres",),
    folds: Sequence[Union[int, str]] = (0, 1, 2, 3, 4),
    strict: bool = True,
):
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    results = require("results")
    with zipfile.ZipFile(output_file, "w", zipfile.ZIP_DEFLATED) as zf:
        for config in configurations:
            model_dir = os.path.join(results, dataset_name,
                                     f"{trainer}__{plans_identifier}__{config}")
            if not os.path.isdir(model_dir):
                if strict:
                    raise RuntimeError(f"missing trained model folder {model_dir}")
                continue
            for f in _KEEP_FILES:
                p = os.path.join(model_dir, f)
                if os.path.isfile(p):
                    zf.write(p, os.path.relpath(p, results))
            for fold in folds:
                fdir = os.path.join(model_dir, f"fold_{fold}")
                if not os.path.isdir(fdir):
                    if strict:
                        raise RuntimeError(f"missing fold folder {fdir}")
                    continue
                wrote_ckpt = False
                for ck in _CKPT_NAMES:
                    p = os.path.join(fdir, ck)
                    if os.path.isfile(p):
                        zf.write(p, os.path.relpath(p, results))
                        wrote_ckpt = True
                        break
                if strict and not wrote_ckpt:
                    raise RuntimeError(f"no checkpoint in {fdir}")
                dbg = os.path.join(fdir, "debug.json")
                if os.path.isfile(dbg):
                    zf.write(dbg, os.path.relpath(dbg, results))
    return output_file


def install_model_from_zip_file(zip_file: str):
    results = require("results")
    os.makedirs(results, exist_ok=True)
    with zipfile.ZipFile(zip_file) as zf:
        zf.extractall(results)
    return results
