"""Plans transfer between datasets (matched-topology pretraining workflow).

Capability parity: /root/reference/nnunetv2/experiment_planning/
plans_for_pretraining/move_plans_between_datasets.py — copy the TARGET
dataset's plans onto the SOURCE (pretraining) dataset, rewriting dataset_name
and data identifiers so the source can be preprocessed with the target's
patch/spacing topology (documentation/pretraining_and_finetuning.md workflow).
"""
from __future__ import annotations

import os

from anatomask_tpu.paths import require
from anatomask_tpu.plans.plans_handler import load_json, save_json
from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name


def move_plans_between_datasets(
    source_dataset_name_or_id,
    target_dataset_name_or_id,
    source_plans_identifier: str = "ATKPlans",
    target_plans_identifier: str = None,
) -> str:
    """Copies plans FROM source TO target dataset's preprocessed folder,
    rewriting identifiers. Returns the written plans path."""
    source = maybe_convert_to_dataset_name(source_dataset_name_or_id)
    target = maybe_convert_to_dataset_name(target_dataset_name_or_id)
    target_plans_identifier = target_plans_identifier or source_plans_identifier
    pp = require("preprocessed")
    plans = load_json(os.path.join(pp, source, source_plans_identifier + ".json"))

    plans["dataset_name"] = target
    plans["plans_name"] = target_plans_identifier
    for cfg_name, cfg in plans["configurations"].items():
        if "data_identifier" in cfg:
            ident = cfg["data_identifier"]
            if ident.startswith(source_plans_identifier):
                cfg["data_identifier"] = target_plans_identifier + ident[len(source_plans_identifier):]
            else:
                cfg["data_identifier"] = f"{target_plans_identifier}_{cfg_name}"

    os.makedirs(os.path.join(pp, target), exist_ok=True)
    out = os.path.join(pp, target, target_plans_identifier + ".json")
    save_json(plans, out, sort_keys=False)
    return out
