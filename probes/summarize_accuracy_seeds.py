"""Aggregate the multi-seed low-label finetune arms into a committed summary.

VERDICT r4 item 5: the label-efficiency claim was single-seed. The r5b queue
(probes/run_r5b_queue.sh) re-runs the 40-epoch matched-budget low-label arms
(3 labelled cases of 12, hard task) for seeds 1 and 2; seed 0 is the round-4/5
baseline already in probes/accuracy_loop_hard_result.json. This script groups
`scratch_low3{,_s1,_s2}` / `pretrained_low3{,_s1,_s2}`, reports per-seed final
and tail-mean foreground Dice, and the across-seed mean +- range, writing
probes/accuracy_seeds_summary.json for BASELINE.md to quote.

Reference protocol constants (matched budgets, low-label subset):
/root/reference/nnunetv2/training/nnUNetTrainer/variants/pretrain/pretrain_AntoMask.py:227-241
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
RESULT = os.path.join(HERE, "accuracy_loop_hard_result.json")
OUT = os.path.join(HERE, "accuracy_seeds_summary.json")

TAIL = 5  # epochs averaged for the tail metric (final epoch alone is noisy)


def collect(finetune, base):
    """Per-seed metrics for arms named base, base_s1, base_s2, ..."""
    rows = []
    for tag, rec in sorted(finetune.items()):
        if tag != base and not (
            tag.startswith(base + "_s") and tag[len(base) + 2 :].isdigit()
        ):
            continue
        seed = 0 if tag == base else int(tag[len(base) + 2 :])
        dice = rec["mean_fg_dice"]
        rows.append(
            {
                "tag": tag,
                "seed": seed,
                "num_epochs": rec["num_epochs"],
                "final_mean_fg_dice": round(dice[-1], 4),
                "tail%d_mean_fg_dice" % TAIL: round(sum(dice[-TAIL:]) / TAIL, 4),
            }
        )
    return sorted(rows, key=lambda r: r["seed"])


def spread(rows, key):
    vals = [r[key] for r in rows]
    return {
        "mean": round(sum(vals) / len(vals), 4),
        "min": min(vals),
        "max": max(vals),
        "range": round(max(vals) - min(vals), 4),
        "n_seeds": len(vals),
    }


def main():
    data = json.load(open(RESULT))
    ft = data["finetune"]
    tailkey = "tail%d_mean_fg_dice" % TAIL
    out = {
        "source": os.path.basename(RESULT),
        "protocol": (
            "hard synthetic task (12 cases, 3 labelled = low-label regime), "
            "STUNet-B, 40-epoch matched budget both arms, seed varies data "
            "order + init of the finetune only; shared 50-epoch SSL checkpoint"
        ),
        "arms": {},
    }
    for base in ("scratch_low3", "pretrained_low3"):
        rows = collect(ft, base)
        if not rows:
            continue
        out["arms"][base] = {
            "per_seed": rows,
            "final": spread(rows, "final_mean_fg_dice"),
            "tail": spread(rows, tailkey),
        }
    s, p = out["arms"].get("scratch_low3"), out["arms"].get("pretrained_low3")
    if s and p:
        out["delta_pretrained_minus_scratch"] = {
            "final_mean": round(p["final"]["mean"] - s["final"]["mean"], 4),
            "tail_mean": round(p["tail"]["mean"] - s["tail"]["mean"], 4),
            "per_seed_final": [
                round(pr["final_mean_fg_dice"] - sr["final_mean_fg_dice"], 4)
                for sr, pr in zip(s["per_seed"], p["per_seed"])
                if sr["seed"] == pr["seed"]
            ],
        }
    # Full-data null result, stated alongside per the verdict: at full labels
    # and larger budget, scratch catches up (VERDICT r4 weak #3).
    full = {}
    for tag in ("scratch", "pretrained"):
        if tag in ft:
            d = ft[tag]["mean_fg_dice"]
            full[tag] = {
                "num_epochs": ft[tag]["num_epochs"],
                "final_mean_fg_dice": round(d[-1], 4),
                tailkey: round(sum(d[-TAIL:]) / TAIL, 4),
            }
    out["full_data_arms"] = full
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
