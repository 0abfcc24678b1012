"""Summarize the low-label seed-replication arms (VERDICT r4 item 5).

Reads probes/accuracy_loop_hard_result.json (arms scratch_low3 /
pretrained_low3 and their _s{N} seed replicates, 40-epoch matched budget) and
writes probes/lowlabel_seed_summary.json with per-arm mean +/- range of the
final and best mean-fg-Dice, plus the full-data arms' numbers for the honest
null-result statement in BASELINE.md.
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    d = json.load(open(os.path.join(HERE, "accuracy_loop_hard_result.json")))
    ft = d["finetune"]
    out = {"arms": {}}
    for base in ("scratch_low3", "pretrained_low3"):
        finals, bests, tails, tags = [], [], [], []
        for tag, r in sorted(ft.items()):
            if tag == base or (tag.startswith(base + "_s")
                               and tag[len(base) + 2:].isdigit()):
                if r["num_epochs"] != 40:
                    continue
                curve = r["mean_fg_dice"]
                finals.append(curve[-1])
                bests.append(max(curve))
                tails.append(sum(curve[-5:]) / 5)  # last-5 mean: final alone is noisy
                tags.append(tag)
        if not finals:
            continue
        out["arms"][base] = {
            "seeds": tags,
            "final_dice": [round(v, 4) for v in finals],
            "final_mean": round(sum(finals) / len(finals), 4),
            "final_range": [round(min(finals), 4), round(max(finals), 4)],
            "best_dice": [round(v, 4) for v in bests],
            "best_mean": round(sum(bests) / len(bests), 4),
            "best_range": [round(min(bests), 4), round(max(bests), 4)],
            "tail5_dice": [round(v, 4) for v in tails],
            "tail5_mean": round(sum(tails) / len(tails), 4),
            "tail5_range": [round(min(tails), 4), round(max(tails), 4)],
        }
    s = out["arms"].get("scratch_low3")
    p = out["arms"].get("pretrained_low3")
    if s and p and len(s["final_dice"]) >= 2 and len(p["final_dice"]) >= 2:
        out["gap_final_mean"] = round(p["final_mean"] - s["final_mean"], 4)
        out["gap_tail5_mean"] = round(p["tail5_mean"] - s["tail5_mean"], 4)
        out["gap_tail5_per_seed"] = [
            round(pv - sv, 4)
            for pv, sv in zip(p["tail5_dice"], s["tail5_dice"])]
        out["ranges_overlap_final"] = not (
            p["final_range"][0] > s["final_range"][1]
            or s["final_range"][0] > p["final_range"][1])
        out["ranges_overlap_tail5"] = not (
            p["tail5_range"][0] > s["tail5_range"][1]
            or s["tail5_range"][0] > p["tail5_range"][1])
    # full-data null result (committed round 4): scratch at 2x epochs wins
    for tag in ("scratch", "pretrained"):
        if tag in ft:
            out.setdefault("full_data_arms", {})[tag] = {
                "num_epochs": ft[tag]["num_epochs"],
                "final_dice": round(ft[tag]["mean_fg_dice"][-1], 4),
            }
    path = os.path.join(HERE, "lowlabel_seed_summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
