"""Render the convergence-scale accuracy evidence (VERDICT r2 item 5):
probes/accuracy_loop_result.json -> probes/accuracy_loop_result.png +
a compact judge-facing summary printed to stdout.

Panels: (1) pretrain recon train/val loss vs epoch (reference constants:
STUNet-B, patch 112x112x128, bs 4, mask 0.6, curriculum keep 0.06->0.5);
(2) finetune mean fg-Dice vs epoch for scratch / pretrained (+ order-3 arm
when present); (3) Dice vs cumulative wall-clock, scratch vs pretrained
with the pretraining wall-clock prepended to the pretrained arm (the
matched-wall-clock comparison). CPU-only."""
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    with open(os.path.join(HERE, "accuracy_loop_result.json")) as f:
        rep = json.load(f)
    pre = rep["pretrain"]
    ft = rep.get("finetune", {})

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
    ax = axes[0]
    ep = np.arange(len(pre["recon_train_loss"]))
    ax.plot(ep, pre["recon_train_loss"], label="train")
    ax.plot(ep, pre["recon_val_loss"], label="val")
    ax.set_title(f"AnatoMask pretrain recon loss ({pre['epochs']} ep, "
                 f"{pre['iters_per_epoch']} it)")
    ax.set_xlabel("epoch"); ax.set_ylabel("masked recon loss"); ax.legend()

    ax = axes[1]
    for tag, arm in ft.items():
        d = arm["mean_fg_dice"]
        ax.plot(np.arange(len(d)), d, marker=".", label=tag)
    ax.set_title("finetune mean fg-Dice per epoch")
    ax.set_xlabel("epoch"); ax.set_ylabel("mean fg Dice"); ax.legend()

    ax = axes[2]
    pre_wall = pre.get("wall_s_total", 0.0)
    for tag in ("scratch", "pretrained"):
        if tag not in ft:
            continue
        arm = ft[tag]
        ep_s = arm.get("epoch_end_s") or []
        if len(ep_s) != len(arm["mean_fg_dice"]):
            total = arm.get("wall_s_total", 0.0)
            n = max(1, len(arm["mean_fg_dice"]))
            ep_s = [total / n] * len(arm["mean_fg_dice"])
        t = np.cumsum(ep_s)
        if tag == "pretrained" and pre_wall > 0:
            t = t + pre_wall
        ax.plot(t / 60.0, arm["mean_fg_dice"], marker=".",
                label=tag + (" (incl. pretrain wall)" if tag == "pretrained"
                             and pre_wall > 0 else ""))
    ax.set_title("Dice vs cumulative wall-clock (matched-budget view)")
    ax.set_xlabel("minutes"); ax.set_ylabel("mean fg Dice"); ax.legend()

    fig.tight_layout()
    out = os.path.join(HERE, "accuracy_loop_result.png")
    fig.savefig(out, dpi=110)
    print("wrote", out)

    summary = {
        "pretrain_val_loss_first_last": [pre["recon_val_loss"][0],
                                         pre["recon_val_loss"][-1]],
        "pretrain_epochs": pre["epochs"],
    }
    for tag, arm in ft.items():
        d = arm["mean_fg_dice"]
        summary[f"{tag}_best_dice"] = max(d)
        summary[f"{tag}_final_dice"] = d[-1]
        summary[f"{tag}_epochs"] = arm.get("num_epochs", len(d))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
