#!/usr/bin/env python
"""THE quality-vs-compute curve (VERDICT r4 item 5).

Final visible-region SDF MAE vs effective optimisation steps per
simulated second: the pinned-clock solo curve (8 campaign configs per
rate, mean +/- sem) with the K-sharing operating points overlaid
(K=4@200, K=2@200, K=4@100, natural solo). This is the reference's
frac_time_perception ablation (isdf/modules/trainer.py:273-283) recast
for an engine with a 2.1x real-time surplus: it locates the saturation
knee that justifies every scenes-per-chip / rays-per-step trade.

Reads experiments/quality_compute_curve/summary.json (+ the scattered
multi-scene summaries); writes experiments/figures/quality_compute.png.
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

INK = "#1f2430"
MUTED = "#8a8f98"
ACCENT = "#b3582a"
GRID = "#e3e5e8"


def _load(p):
    with open(os.path.join(HERE, p)) as f:
        return json.load(f)


def main(out=None):
    out = out or os.path.join(HERE, "figures", "quality_compute.png")
    curve = _load("quality_compute_curve/summary.json")["rates"]

    fig, ax = plt.subplots(figsize=(7.2, 4.6))
    rates = sorted(int(r) for r in curve)
    mean = [curve[str(r)]["mean_cm"] for r in rates]
    sem = [curve[str(r)]["sem_cm"] for r in rates]
    ax.errorbar(rates, mean, yerr=sem, color=INK, lw=2, marker="o",
                ms=6, capsize=3, zorder=5,
                label="solo, clock pinned (8 runs, mean$\\pm$sem)")

    # K-sharing operating points
    pts = []
    k4 = _load("multi_scene_k4/summary.json")
    v = [s["joint_cm"] for s in k4["scenes"].values()]
    pts.append((61.6, np.mean(v), np.std(v, ddof=1) / np.sqrt(len(v)),
                "K=4 @ 200 rays", "s"))
    k2 = _load("multi_scene_quality/summary.json")
    v = [s["joint_cm"] for p in k2["pairs"]
         for s in p["scenes"].values()]
    pts.append((123.6, np.mean(v), np.std(v, ddof=1) / np.sqrt(len(v)),
                "K=2 @ 200 rays", "D"))
    try:
        k4r = _load("multi_scene_k4_r100/summary.json")
        v = [s["joint_r100_cm"] for s in k4r["scenes"].values()]
        pts.append((k4r["mean_steps_per_sec_effective"], np.mean(v),
                    np.std(v, ddof=1) / np.sqrt(len(v)),
                    "K=4 @ 100 rays", "^"))
    except FileNotFoundError:
        pass
    sol = _load("round4_campaign/paired_summary.json")["round4"]
    v = list(sol.values())
    pts.append((246.0, np.mean(v), np.std(v, ddof=1) / np.sqrt(len(v)),
                "solo, natural clock", "v"))

    for x, y, e, lbl, mk in pts:
        ax.errorbar([x], [y], yerr=[e], color=ACCENT, marker=mk, ms=7,
                    lw=0, elinewidth=1.2, capsize=3, zorder=6, label=lbl)

    ax.set_xscale("log")
    ax.set_xticks(rates)
    ax.set_xticklabels([str(r) for r in rates])
    ax.set_xlabel("effective optimisation steps per simulated second")
    ax.set_ylabel("final visible-region SDF MAE (cm)")
    ax.set_title("Quality vs compute: where the knee is", fontsize=11)
    ax.grid(color=GRID, lw=0.7, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.legend(fontsize=8.5, frameon=False, loc="upper right")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=160)
    print("wrote", out)


if __name__ == "__main__":
    main()
