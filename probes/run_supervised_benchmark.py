"""VERDICT r3 ask #6: the TPU supervised 5-epoch benchmark artifact
(reference protocol: nnUNetTrainerBenchmark_5epochs[_noDataLoading] — fastest
epoch of 5 written to benchmark_result.json keyed by software/device,
/root/reference/documentation/benchmarking.md:7-19).

Runs BOTH benchmark trainers on the plans-default 3d_fullres configuration of
the accuracy-loop dataset (one axon process at a time; run after any other TPU
job finishes) and copies the merged benchmark_result.json to the repo root as
BENCH_supervised_r04.json with a session-bandwidth note.

Env: BM_ITERS (default 250, reference constant; smoke-test with e.g. 25),
BM_VAL_ITERS (default 50), BM_HARD=1 to use the hard dataset (default: 1,
shares preprocessing with the accuracy loop), BM_OUT (default
BENCH_supervised_r05.json), BM_ONLY (comma list of variants).

Round 5 adds the "_default" variant: device_cache=None, i.e. exactly what a
user gets with a stock TrainerConfig and NO env vars — VERDICT r4 item 4
requires the default data path to be the safe one (the auto-enabled HBM case
cache) with flat host RSS; peak RSS (ru_maxrss) is recorded per variant.
"""
import json
import os
import shutil
import sys
import time

os.environ.setdefault("ACC_HARD", os.environ.get("BM_HARD", "1"))
sys.path.insert(0, os.path.dirname(__file__))
import accuracy_loop  # noqa: E402  (sets ATK_* env + jax cache config)

from dataclasses import replace  # noqa: E402


def main():
    accuracy_loop.make_data()
    import jax
    import numpy as np
    from anatomask_tpu.plans.plans_handler import load_json
    from anatomask_tpu.training.trainer import TRAINER_PRESETS, Trainer

    pp = f"/tmp/acc/pp/{accuracy_loop.DSET}"
    dataset_json = load_json(os.path.join(pp, "dataset.json"))
    iters = int(os.environ.get("BM_ITERS", "250"))
    val_iters = int(os.environ.get("BM_VAL_ITERS", "50"))
    results = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = os.path.join(repo, os.environ.get("BM_OUT",
                                                   "BENCH_supervised_r05.json"))
    if os.path.isfile(bench_path):  # merge: re-runs add variants, not clobber
        results.update(json.load(open(bench_path)))
    presets = ("ATKTrainerBenchmark_5epochs_noDataLoading",
               "ATKTrainerBenchmark_5epochs",
               # round 4: same with-dataloading protocol through the
               # HBM-resident supervised device cache — measures how much of
               # the host pipeline the cache hides
               "ATKTrainerBenchmark_5epochs_deviceCache",
               # round 5: the DEFAULT config (device_cache=None -> auto-gate,
               # no env vars): must match the deviceCache variant and keep
               # host RSS flat (VERDICT r4 item 4)
               "ATKTrainerBenchmark_5epochs_default")
    only = os.environ.get("BM_ONLY")
    for preset in presets:
        if only and preset not in only.split(","):
            continue
        base = preset.replace("_deviceCache", "").replace("_default", "")
        # the _default variant passes device_cache=None — the stock config; the
        # others pin an explicit bool so the auto-gate can't silently flip the
        # host-pipeline baselines
        dc = None if preset.endswith("_default") else preset.endswith("_deviceCache")
        cfg = replace(TRAINER_PRESETS[base],
                      name=preset,
                      num_iterations_per_epoch=iters,
                      num_val_iterations_per_epoch=val_iters,
                      device_cache=dc,
                      device_cache_mb=3072,
                      # plans memory targets model torch's allocator; the jit
                      # step needs remat at plans-sized patches on 16G (CLAUDE.md)
                      remat=True, num_workers=4)
        tr = Trainer(os.path.join(pp, "ATKPlans.json"), "3d_fullres", 0,
                     dataset_json, cfg)
        tr.disable_checkpointing = True
        t0 = time.time()
        tr.run_training()
        out_file = os.path.join(tr.output_folder, "benchmark_result.json")
        results[preset] = load_json(out_file)
        results[preset]["wall_s_total"] = round(time.time() - t0, 1)
        results[preset]["iters_per_epoch"] = iters
        results[preset]["patch_size"] = list(tr.configuration_manager.patch_size)
        results[preset]["batch_size"] = int(tr.global_batch_size)
        import resource
        results[preset]["peak_rss_mb_process"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
        results[preset]["device_cache_active"] = (
            tr.device_cache_train is not None)
        print(f"{preset}: {json.dumps(results[preset])}", flush=True)

    with open(bench_path, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
