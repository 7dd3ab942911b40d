"""Result aggregation + paper-style figures.

Reference: isdf/eval/figs/{all_seq.py,per_seq.py} — reads the per-run
vox_res.json/res.json artifacts (ours and the reference's shipped exp0
runs share the schema), aggregates mean +/- std over seeded repeats per
sequence, and renders quality-over-simulated-time curves.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_run(run_dir: str, fname: str = "vox_res.json") -> Optional[Dict]:
    p = os.path.join(run_dir, fname)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f, parse_constant=lambda c: float("nan"))


def runs_by_sequence(root: str, fname: str = "vox_res.json"
                     ) -> Dict[str, List[Dict]]:
    """Group <root>/<seq>_<i>/ run dirs by sequence name
    (reference all_seq.py:184-231 over results/iSDF/exp0)."""
    out: Dict[str, List[Dict]] = {}
    for d in sorted(glob.glob(os.path.join(root, "*"))):
        if not os.path.isdir(d):
            continue
        m = re.match(r"(.+)_(\d+)$", os.path.basename(d))
        if not m:
            continue
        r = load_run(d, fname)
        if r is not None:
            out.setdefault(m.group(1), []).append(r)
    return out


def _get_path(d: Dict, path: Sequence[str]):
    for k in path:
        d = d[k]
    return d


def curve(run: Dict, metric=("rays", "vis", "av_l1")
          ) -> Tuple[np.ndarray, np.ndarray]:
    """(times, values) of one run's timed entries. Keys of vox_res.json
    are the eval wall-times (stringified floats)."""
    ts, vs = [], []
    for k, entry in run.items():
        if not isinstance(entry, dict):
            continue
        try:
            v = _get_path(entry, metric)
        except (KeyError, TypeError):
            continue
        ts.append(entry.get("time", float(k)))
        vs.append(v)
    order = np.argsort(ts)
    return np.asarray(ts)[order], np.asarray(vs, float)[order]


def mean_std_curve(runs: List[Dict], metric=("rays", "vis", "av_l1"),
                   n_grid: int = 50):
    """Interpolate each run's curve onto a common time grid, return
    (t, mean, std) (reference all_seq.py:233-271)."""
    curves = [curve(r, metric) for r in runs]
    curves = [(t, v) for t, v in curves if len(t) >= 2]
    if not curves:
        return None
    t0 = max(t[0] for t, _ in curves)
    t1 = min(t[-1] for t, _ in curves)
    grid = np.linspace(t0, t1, n_grid)
    interp = np.stack([np.interp(grid, t, v) for t, v in curves])
    return grid, np.nanmean(interp, axis=0), np.nanstd(interp, axis=0)


def final_values(runs: List[Dict], metric=("rays", "vis", "av_l1")):
    """Mean +/- std of each run's final eval (the BASELINE.md numbers)."""
    vals = []
    for r in runs:
        t, v = curve(r, metric)
        if len(v):
            vals.append(v[-1])
    if not vals:
        return float("nan"), float("nan")
    return float(np.nanmean(vals)), float(np.nanstd(vals))


def plot_all_seq(root: str, out_file: str,
                 metric=("rays", "vis", "av_l1"),
                 ylabel: str = "SDF error [m]",
                 baselines: Optional[Dict[str, str]] = None,
                 fname: str = "vox_res.json"):
    """Fig-8-style grid: one panel per sequence, mean +/- std band per
    method (reference all_seq.py:289-428). ``baselines`` maps label ->
    results root in the same layout."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    methods = {"isdf_tpu": root}
    if baselines:
        methods.update(baselines)

    all_groups = {label: runs_by_sequence(r, fname)
                  for label, r in methods.items()}
    seqs = sorted({s for g in all_groups.values() for s in g})
    if not seqs:
        raise ValueError(f"no runs found under {root}")

    ncol = min(3, len(seqs))
    nrow = int(np.ceil(len(seqs) / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(5 * ncol, 3.5 * nrow),
                             squeeze=False)
    for i, seq in enumerate(seqs):
        ax = axes[i // ncol][i % ncol]
        for label, groups in all_groups.items():
            if seq not in groups:
                continue
            ms = mean_std_curve(groups[seq], metric)
            if ms is None:
                continue
            t, m, s = ms
            ax.plot(t, m, label=f"{label} (n={len(groups[seq])})")
            ax.fill_between(t, m - s, m + s, alpha=0.25)
        ax.set_title(seq)
        ax.set_xlabel("simulated time [s]")
        ax.set_ylabel(ylabel)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_file, dpi=120)
    plt.close(fig)
    return out_file
