"""Segmentation evaluation.

Capability parity: /root/reference/nnunetv2/evaluation/evaluate_predictions.py:
(compute_metrics :89 per case/label-or-region Dice, IoU, TP/FP/FN/TN,
n_pred/n_ref with optional ignore mask; compute_metrics_on_folder :123 with a
process pool -> summary.json: metric_per_case, per-class 'mean',
'foreground_mean').
"""
from __future__ import annotations

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Tuple, Union

import numpy as np

from anatomask_tpu.plans.plans_handler import save_json


def label_or_region_to_mask(segmentation: np.ndarray, label_or_region) -> np.ndarray:
    if isinstance(label_or_region, (tuple, list)):
        return np.isin(segmentation, np.asarray(label_or_region))
    return segmentation == label_or_region


def compute_tp_fp_fn_tn(mask_ref: np.ndarray, mask_pred: np.ndarray,
                        ignore_mask: Optional[np.ndarray] = None):
    if ignore_mask is None:
        use = np.ones_like(mask_ref, dtype=bool)
    else:
        use = ~ignore_mask
    tp = int(np.sum(mask_ref & mask_pred & use))
    fp = int(np.sum(~mask_ref & mask_pred & use))
    fn = int(np.sum(mask_ref & ~mask_pred & use))
    tn = int(np.sum(~mask_ref & ~mask_pred & use))
    return tp, fp, fn, tn


def compute_metrics(reference_file: str, prediction_file: str, image_reader_writer,
                    labels_or_regions, ignore_label: Optional[int] = None) -> dict:
    seg_ref, _ = image_reader_writer.read_seg(reference_file)
    seg_pred, _ = image_reader_writer.read_seg(prediction_file)
    seg_ref = seg_ref[0]
    seg_pred = seg_pred[0]
    ignore_mask = (seg_ref == ignore_label) if ignore_label is not None else None

    results = {
        "reference_file": reference_file,
        "prediction_file": prediction_file,
        "metrics": {},
    }
    for r in labels_or_regions:
        key = str(r) if isinstance(r, (tuple, list)) else r
        mask_ref = label_or_region_to_mask(seg_ref, r)
        mask_pred = label_or_region_to_mask(seg_pred, r)
        tp, fp, fn, tn = compute_tp_fp_fn_tn(mask_ref, mask_pred, ignore_mask)
        if tp + fp + fn == 0:
            dice = iou = np.nan
        else:
            dice = 2 * tp / (2 * tp + fp + fn)
            iou = tp / (tp + fp + fn)
        results["metrics"][key] = {
            "Dice": dice, "IoU": iou,
            "TP": tp, "FP": fp, "FN": fn, "TN": tn,
            "n_pred": fp + tp, "n_ref": fn + tp,
        }
    return results


def compute_metrics_on_folder(
    folder_ref: str,
    folder_pred: str,
    output_file: Optional[str],
    image_reader_writer,
    file_ending: str,
    labels_or_regions,
    ignore_label: Optional[int] = None,
    num_processes: int = 4,
    chill: bool = True,
) -> dict:
    files_pred = sorted(f for f in os.listdir(folder_pred) if f.endswith(file_ending))
    files_ref = sorted(f for f in os.listdir(folder_ref) if f.endswith(file_ending))
    if not chill:
        assert all(f in files_ref for f in files_pred), (
            "Not all files in folder_pred exist in folder_ref"
        )
    files_ref = [os.path.join(folder_ref, f) for f in files_pred]
    files_pred_full = [os.path.join(folder_pred, f) for f in files_pred]

    if num_processes > 1 and len(files_pred_full) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=num_processes) as ex:
            results = list(ex.map(
                lambda rp: compute_metrics(rp[0], rp[1], image_reader_writer,
                                           labels_or_regions, ignore_label),
                list(zip(files_ref, files_pred_full))))
    else:
        results = [
            compute_metrics(r, p, image_reader_writer, labels_or_regions, ignore_label)
            for r, p in zip(files_ref, files_pred_full)
        ]

    metric_list = list(results[0]["metrics"][list(results[0]["metrics"].keys())[0]].keys()) if results else []
    means = {}
    for r in labels_or_regions:
        key = str(r) if isinstance(r, (tuple, list)) else r
        means[key] = {
            m: float(np.nanmean([res["metrics"][key][m] for res in results]))
            for m in metric_list
        }
    foreground_mean = {
        m: float(np.nanmean([means[k][m] for k in means])) for m in metric_list
    }

    result = {
        "metric_per_case": results,
        "mean": means,
        "foreground_mean": foreground_mean,
    }
    if output_file is not None:
        serializable = _to_serializable(result)
        save_json(serializable, output_file, sort_keys=False)
    return result


def _to_serializable(obj):
    if isinstance(obj, dict):
        return {str(k): _to_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_serializable(v) for v in obj]
    if isinstance(obj, (np.floating, float)):
        v = float(obj)
        return None if np.isnan(v) else v
    if isinstance(obj, (np.integer,)):
        return int(obj)
    return obj
