#!/usr/bin/env python
"""ONE quality-vs-compute curve (VERDICT r4 item 5).

The reference exposes this trade as frac_time_perception
(/root/reference/isdf/modules/trainer.py:273-283): scale how much of
real time the mapper may spend optimising, and quality degrades as the
effective step rate drops. Our engine's points currently live scattered
across multi_scene_k4 (61.6 steps/s via K=4 time-sharing),
multi_scene_quality (123.6 via K=2), round4_campaign (~246 solo) and
bench.py (633 at the reference's fixed workload). This runner measures
the PURE step-rate axis: the solo campaign protocol with the sim clock
PINNED to {62, 123, 246, 633} steps per simulated second
(trainer._per_step_device_s = 1/rate, _bill_exact — deterministic,
no wall-clock noise), all 8 campaign (scene, seed) configs per rate,
so each rate carries paired error bars against the same 8 runs.

Overlaying the K-sharing points on this curve separates the two
possible causes of the K=4 cost: if K=4@61.6 lands ON the pinned-62
curve point, time-sharing costs nothing beyond its step-rate; if it
lands above, staleness/interleaving adds its own penalty.

Usage: python experiments/run_quality_compute_curve.py [out_root]
                [--rates 62,123,246,633] [--only room_a_0,...]
Writes <out_root>/summary.json (incremental — reruns skip done cells).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SOLO = "/root/repo/experiments/round4_campaign"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root", nargs="?",
                    default="/root/repo/experiments/quality_compute_curve")
    ap.add_argument("--rates", default="62,123,246,633")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import numpy as np

    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.utils.config import config_from_dict

    rates = [int(r) for r in args.rates.split(",")]
    runs = sorted(d for d in glob.glob(os.path.join(SOLO, "*"))
                  if os.path.isdir(d))
    only = set(args.only.split(",")) if args.only else None
    os.makedirs(args.out_root, exist_ok=True)
    cells_path = os.path.join(args.out_root, "cells.json")
    cells = (json.load(open(cells_path))
             if os.path.exists(cells_path) else {})

    solo_finals = json.load(
        open(os.path.join(SOLO, "paired_summary.json")))["round4"]

    for rate in rates:
        for d in runs:
            name = os.path.basename(d)
            if only and name not in only:
                continue
            key = f"{name}@{rate}"
            if key in cells:
                print(f"skip {key} (done: {cells[key]['cm']} cm)",
                      flush=True)
                continue
            cfg_d = json.load(open(os.path.join(d, "config.json")))
            cfg = config_from_dict(cfg_d).replace(do_eval=False)
            tr = Trainer(cfg, seed=int(cfg_d["seed"]))
            tr._per_step_device_s = 1.0 / rate
            tr._bill_exact = True
            res = train_loop(tr, log_fn=None)
            ev = eval_sdf(tr, visible_region=True,
                          seed=int(tr.tot_step_time * 1e3))
            cm = float(ev["av_l1"]) * 100
            cells[key] = {"cm": round(cm, 3), "steps": res.steps,
                          "t_sim_s": round(tr.tot_step_time, 2)}
            print(f"{key}: {cm:.2f} cm, {res.steps} steps, "
                  f"t_sim {tr.tot_step_time:.1f}s", flush=True)
            with open(cells_path, "w") as f:
                json.dump(cells, f, indent=2)
            del tr

    # summarise: per-rate mean +/- sem over configs, paired delta vs
    # the natural-clock round4_campaign finals of the same configs
    names = sorted({k.split("@")[0] for k in cells})
    summary = {"rates": {}, "scatter_overlays": {
        "k4_r200_61.6": "experiments/multi_scene_k4/summary.json",
        "k2_r200_123.6": "experiments/multi_scene_quality/summary.json",
        "k4_r100": "experiments/multi_scene_k4_r100/summary.json",
        "solo_natural_246": "experiments/round4_campaign/paired_summary.json",
    }, "protocol": "solo campaign configs, sim clock pinned to "
       "1/rate s/step (bill-exact), final visible-region MAE"}
    for rate in rates:
        vals, deltas = [], []
        for n in names:
            c = cells.get(f"{n}@{rate}")
            if not c:
                continue
            vals.append(c["cm"])
            if n in solo_finals:
                deltas.append(c["cm"] - solo_finals[n])
        if not vals:
            continue
        v = np.asarray(vals)
        dd = np.asarray(deltas)
        summary["rates"][str(rate)] = {
            "n": len(v), "mean_cm": round(float(v.mean()), 3),
            "sem_cm": round(float(v.std(ddof=1) / np.sqrt(len(v))), 3),
            "paired_delta_vs_natural_cm": round(float(dd.mean()), 3),
            "paired_sem_cm": round(
                float(dd.std(ddof=1) / np.sqrt(len(dd))), 3),
            "per_run_cm": {n: cells[f"{n}@{rate}"]["cm"]
                           for n in names if f"{n}@{rate}" in cells}}
    with open(os.path.join(args.out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for r, s in summary["rates"].items():
        print(f"rate {r}: {s['mean_cm']:.2f} +/- {s['sem_cm']:.2f} cm "
              f"(n={s['n']})")


if __name__ == "__main__":
    main()
