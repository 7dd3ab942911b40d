#!/usr/bin/env python
"""Multi-scene figure: throughput vs K (one chip) and the paired
shared-chip quality comparison.

Reads the committed artifacts (experiments/multi_scene/results.json,
experiments/multi_scene_quality/summary.json); writes
experiments/figures/multi_scene.png.
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
BAND = "#e8e2d4"
GRID = "#e3e5e8"


def main(out=None):
    out = out or os.path.join(HERE, "figures", "multi_scene.png")
    runs = json.load(open(os.path.join(
        HERE, "multi_scene", "results.json")))["runs"]
    qual = json.load(open(os.path.join(
        HERE, "multi_scene_quality", "summary.json")))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11.2, 4.4))

    # ---- panel 1: steps/s vs K (one unit, two series + budget line) ----
    ks = sorted(int(k) for k in runs)
    per = [runs[str(k)]["per_scene_steps_per_sec"] for k in ks]
    agg = [runs[str(k)]["aggregate_steps_per_sec"] for k in ks]
    xs = np.arange(len(ks))
    ax1.axhline(300, color=MUTED, lw=1.2, ls="--", zorder=2)
    ax1.text(xs[-1] + 0.08, 308, "real-time budget\n(300 steps/s)",
             fontsize=8.5, color=MUTED, va="bottom", ha="right")
    ax1.plot(xs, agg, color=MUTED, lw=2, marker="o", ms=6,
             label="aggregate (chip)", zorder=3)
    ax1.plot(xs, per, color=INK, lw=2, marker="o", ms=6,
             label="per scene", zorder=4)
    for i, (x, v) in enumerate(zip(xs, per)):
        if i > 0:  # at K=1 per-scene == aggregate; label once
            ax1.annotate(f"{v:.0f}", (x, v), textcoords="offset points",
                         xytext=(0, -14), ha="center", fontsize=8.5,
                         color=INK)
    for x, v in zip(xs, agg):
        ax1.annotate(f"{v:.0f}", (x, v), textcoords="offset points",
                     xytext=(0, 8), ha="center", fontsize=8.5,
                     color=MUTED)
    ax1.set_xticks(xs)
    ax1.set_xticklabels([f"K={k}" for k in ks], fontsize=9)
    ax1.set_ylabel("optimisation steps/s", fontsize=9.5)
    ax1.set_ylim(0, 720)
    ax1.legend(fontsize=8.5, frameon=False, loc="center left")
    ax1.set_title("K scenes, ONE v5e chip: joint-bundle throughput\n"
                  "(full reference workload each; flat aggregate = "
                  "zero joining overhead)", fontsize=9.5, loc="left")

    # ---- panel 2: paired quality, solo vs shared-chip ----
    scenes = {}
    for p in qual["pairs"]:
        scenes.update(p["scenes"])
    names = sorted(scenes)
    k4 = {}
    k4_path = os.path.join(HERE, "multi_scene_k4", "summary.json")
    if os.path.exists(k4_path):
        k4 = json.load(open(k4_path))["scenes"]
    xs2 = np.arange(len(names))
    ax2.axhspan(3.4, 4.5, color=BAND, zorder=0)
    ax2.text(len(names) - 0.52, 3.95, "reference regime\n(exp0 finals)",
             ha="right", va="center", fontsize=8.5, color=MUTED)
    for x, n in zip(xs2, names):
        s, j = scenes[n]["solo_cm"], scenes[n]["joint_cm"]
        ax2.plot([x, x], [s, j], color=GRID, lw=1.6, zorder=2)
    ax2.scatter(xs2, [scenes[n]["solo_cm"] for n in names], s=40,
                color=MUTED, zorder=3, label="solo (1 scene/chip)")
    ax2.scatter(xs2, [scenes[n]["joint_cm"] for n in names], s=40,
                color=INK, zorder=4, label="shared chip (2 scenes)")
    if k4:
        xk = [x for x, n in zip(xs2, names) if n in k4]
        yk = [k4[n]["joint_cm"] for n in names if n in k4]
        ax2.scatter(xk, yk, s=46, marker="^", color=INK, zorder=4,
                    facecolors="none", linewidths=1.6,
                    label="shared chip (4 scenes)")
    def _label(n):  # "room_a_0" -> "room a\nseed 0"
        parts = n.rsplit("_", 1)
        return parts[0].replace("_", " ") + f"\nseed {parts[1]}"

    ax2.set_xticks(xs2)
    ax2.set_xticklabels([_label(n) for n in names], fontsize=8.5)
    ax2.set_ylabel("final visible-region SDF MAE (cm)", fontsize=9.5)
    ax2.set_ylim(0, 5.2)
    ax2.legend(fontsize=8.5, frameon=False, loc="lower left")
    verdict = qual["paired_verdict"].split(" -> ")
    ax2.set_title("Paired quality: same (scene, seed), solo vs two-per-"
                  f"chip\n{verdict[0]} → "
                  f"{verdict[1].split(' (')[0]}",
                  fontsize=9.5, loc="left")

    for ax in (ax1, ax2):
        ax.grid(axis="y", color=GRID, lw=0.8, zorder=1)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=MUTED, labelsize=8.5)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print("wrote", out)


if __name__ == "__main__":
    main()
