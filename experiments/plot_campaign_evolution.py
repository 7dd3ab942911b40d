#!/usr/bin/env python
"""Quality-campaign evolution figure: final visible-region SDF MAE per
run across the engine's campaign history (experiments/README.md table),
with the reference's own result regime as context.

Writes experiments/figures/campaign_evolution.png.
"""
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# (label, finals in cm, note) — from experiments/README.md (committed
# res.json artifacts under experiments/<campaign>/)
CAMPAIGNS = [
    ("round1\njnp, ray", [5.81, 5.70, 5.70, 6.73, 4.73, 7.70]),
    ("round2\nkernel, ray", [6.59, 4.72, 5.96, 7.09, 5.73, 8.12]),
    ("round2c\n+tail/clock", [5.17, 5.09, 5.08, 6.88, 4.79, 4.81]),
    ("round2d\n+pc bounds", [3.23, 3.45, 2.89, 2.83, 2.71, 2.09]),
    ("round2e\n+active", [3.19, 3.01, 2.94, 2.98, 2.43, 1.68, 3.37, 2.93]),
    ("round3\nengine rerun", [3.31, 3.16, 3.29, 3.69, 3.29, 3.25, 1.95, 1.75]),
    ("round4\npaired gate", [3.29, 3.05, 3.74, 2.90, 3.77, 2.97, 1.64, 2.35]),
    ("2x rays\n(neutral)", [3.33, 3.42, 3.37, 3.09, 3.43, 3.12, 1.69, 1.85]),
]
REF_BAND = (3.4, 4.5)  # reference exp0 final-MAE regime (BASELINE.md)

INK = "#1f2430"        # mean line / primary text
MUTED = "#8a8f98"      # run dots / secondary text
BAND = "#e8e2d4"       # reference band fill (recessive)
GRID = "#e3e5e8"


def main(out=None):
    out = out or os.path.join(os.path.dirname(__file__), "figures",
                              "campaign_evolution.png")
    fig, ax = plt.subplots(figsize=(9.2, 4.6))
    xs = np.arange(len(CAMPAIGNS))

    ax.axhspan(*REF_BAND, color=BAND, zorder=0)
    ax.text(len(CAMPAIGNS) - 0.52, np.mean(REF_BAND),
            "reference regime\n(exp0 finals, its GPU)", ha="right",
            va="center", fontsize=8.5, color=MUTED)

    rng = np.random.default_rng(0)
    means = []
    for x, (_, finals) in zip(xs, CAMPAIGNS):
        f = np.asarray(finals)
        jitter = rng.uniform(-0.09, 0.09, f.size)
        ax.scatter(x + jitter, f, s=26, color=MUTED, alpha=0.85,
                   edgecolors="white", linewidths=1.2, zorder=3)
        means.append(f.mean())
    ax.plot(xs, means, color=INK, lw=2, zorder=4)
    ax.scatter(xs, means, s=34, color=INK, zorder=5)
    for x, m in zip(xs, means):
        ax.annotate(f"{m:.2f}", (x, m), textcoords="offset points",
                    xytext=(0, -14), ha="center", fontsize=8.5, color=INK)

    ax.set_xticks(xs)
    ax.set_xticklabels([c[0] for c in CAMPAIGNS], fontsize=8.5)
    ax.set_ylabel("final visible-region SDF MAE (cm)", fontsize=9.5)
    ax.set_title("Synthetic benchmark quality across engine campaigns "
                 "(real-time clock, one TPU v5e) — dots: runs, line: mean",
                 fontsize=10, loc="left")
    ax.set_ylim(0, 9)
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
    main(sys.argv[1] if len(sys.argv) > 1 else None)
