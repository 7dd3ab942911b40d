#!/usr/bin/env python
"""Plot the step-budget A/B: reference vs ours quality curves per
scene (mean over seeds, individual runs dotted), from results/*.json.

Usage: python plot_curves.py [results_dir] [out.png]
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "results")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, "curves.png")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = sorted(glob.glob(os.path.join(root, "*.json")))
    # the full-quality-stack arm (run_ours_full.py) lives next door
    full_dir = os.path.join(os.path.dirname(root), "results_full")
    files += sorted(glob.glob(os.path.join(full_dir, "*.json")))

    runs = {}
    for f in files:
        name = os.path.basename(f)[:-5]
        if name == "summary":
            continue
        if name.startswith("ours_full_"):      # ours_full_room_a_0
            sys_name, rest = "ours_full", name[len("ours_full_"):]
        else:                                  # ours_room_a_0 / ref_...
            sys_name, rest = name.split("_", 1)
        scene, seed = rest.rsplit("_", 1)
        runs.setdefault(scene, {}).setdefault(sys_name, []).append(
            json.load(open(f)))

    scenes = sorted(runs)
    fig, axes = plt.subplots(1, max(len(scenes), 1),
                             figsize=(6 * max(len(scenes), 1), 4),
                             squeeze=False)
    colors = {"ref": "C1", "ours": "C0", "ours_full": "C2"}
    labels = {"ref": "reference (torch)", "ours": "isdf_tpu (parity)",
              "ours_full": "isdf_tpu (full stack)"}
    for i, scene in enumerate(scenes):
        ax = axes[0][i]
        for sys_name, rs in sorted(runs[scene].items()):
            curves = []
            for r in rs:
                t = np.array([e["t"] for e in r["curve"]])
                v = np.array([e["vis_mae"] for e in r["curve"]]) * 100
                ax.plot(t, v, ":", color=colors[sys_name], alpha=0.45,
                        lw=1)
                curves.append((t, v))
            t0 = max(c[0][0] for c in curves)
            t1 = min(c[0][-1] for c in curves)
            grid = np.linspace(t0, t1, 60)
            m = np.stack([np.interp(grid, t, v)
                          for t, v in curves]).mean(0)
            label = labels.get(sys_name, sys_name) + f" (n={len(rs)})"
            ax.plot(grid, m, color=colors[sys_name], lw=2, label=label)
        ax.set_title(f"{scene}: visible-region SDF MAE, equal step "
                     "budget (1/300 s per step)")
        ax.set_xlabel("simulated time [s]")
        ax.set_ylabel("MAE [cm]")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(out)


if __name__ == "__main__":
    main()
