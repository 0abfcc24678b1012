"""Batch-run command generation + benchmark summarization.

Capability parity: /root/reference/nnunetv2/batch_running/ — the reference
generates LSF cluster command lines for Decathlon-style sweeps
(generate_lsf_runs_customDecathlon.py) and summarizes benchmark trainer
results (summarize_benchmark_results.py). Here the generator emits plain shell
command lists (one per line) that can be fed to any scheduler (GKE/XManager/
slurm/bash); the summarizer reads the benchmark_result.json files written by
the benchmark trainers.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

from anatomask_tpu.paths import require
from anatomask_tpu.plans.plans_handler import load_json


def generate_training_commands(
    datasets: Sequence,
    configurations: Sequence[str] = ("3d_fullres",),
    trainers: Sequence[str] = ("ATKTrainer",),
    plans: Sequence[str] = ("ATKPlans",),
    folds: Sequence[int] = (0, 1, 2, 3, 4),
    extra_args: str = "",
) -> List[str]:
    cmds = []
    for d in datasets:
        for tr in trainers:
            for p in plans:
                for c in configurations:
                    for f in folds:
                        cmd = f"atk_train {d} {c} {f} -tr {tr} -p {p}"
                        if extra_args:
                            cmd += f" {extra_args}"
                        cmds.append(cmd)
    return cmds


def generate_benchmark_commands(datasets: Sequence, configurations=("2d", "3d_fullres")) -> List[str]:
    cmds = []
    for tr in ("ATKTrainerBenchmark_5epochs", "ATKTrainerBenchmark_5epochs_noDataLoading"):
        cmds.extend(generate_training_commands(datasets, configurations, trainers=(tr,), folds=(0,)))
    return cmds


def summarize_benchmark_results(datasets: Sequence, output_file: Optional[str] = None) -> Dict:
    """Collect benchmark_result.json files across datasets/trainers into one
    table keyed by (dataset, trainer, configuration, hardware)."""
    from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
    results_root = require("results")
    table: Dict[str, dict] = {}
    for d in datasets:
        name = maybe_convert_to_dataset_name(d)
        base = os.path.join(results_root, name)
        if not os.path.isdir(base):
            continue
        for model_dir in sorted(os.listdir(base)):
            if "Benchmark" not in model_dir:
                continue
            for fold_dir in sorted(os.listdir(os.path.join(base, model_dir))):
                f = os.path.join(base, model_dir, fold_dir, "benchmark_result.json")
                if os.path.isfile(f):
                    for hw_key, entry in load_json(f).items():
                        table[f"{name}|{model_dir}|{fold_dir}|{hw_key}"] = entry
    if output_file is not None:
        from anatomask_tpu.plans.plans_handler import save_json
        save_json(table, output_file)
    return table
