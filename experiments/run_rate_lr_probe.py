#!/usr/bin/env python
"""Can a rate-adapted learning rate flatten the quality-vs-compute U?

The curve (experiments/quality_compute_curve) shows that running the
chip flat-out (633 steps/s) is WORSE than 123 steps/s by +0.37 cm
(means 3.13 vs 2.76): between camera frames the optimiser takes ~5x
more Adam steps on the same keyframe window and over-fits it. If that
is the mechanism, shrinking the step size should compensate: at rate R
with lr scaled by f(123/R) the field should integrate roughly the same
total update per unit of camera data. This probe runs the pinned-633
protocol with cfg.lr x {0.44 (=sqrt(123/633)), 0.2 (~123/633)} over the
same 8 campaign (scene, seed) configs and pairs each cell against the
committed lr=1.0 cells at 633 and the optimum cells at 123.

Outcomes: (a) recovery to <=2.76 -> flat-out + scaled lr beats idling
(step_rate_cap becomes a fallback, full throughput keeps peak quality);
(b) partial/no recovery -> the overfit is step-count-, not step-size-,
driven, and the shipped cap stays the optimum. Either way the result is
committed with paired error bars.

Usage: python experiments/run_rate_lr_probe.py [--mults 0.44,0.2]
                [--rate 633] [--only room_a_0,...]
Writes experiments/rate_lr_probe/{cells,summary}.json (incremental).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SOLO = "/root/repo/experiments/round4_campaign"
CURVE = "/root/repo/experiments/quality_compute_curve/cells.json"
OUT = "/root/repo/experiments/rate_lr_probe"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="0.44,0.2")
    ap.add_argument("--rate", type=int, default=633)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import numpy as np

    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.utils.config import config_from_dict

    mults = [float(m) for m in args.mults.split(",")]
    names = sorted(os.path.basename(d) for d in os.listdir(SOLO)
                   if os.path.isdir(os.path.join(SOLO, d)))
    only = set(args.only.split(",")) if args.only else None
    os.makedirs(OUT, exist_ok=True)
    cells_path = os.path.join(OUT, "cells.json")
    cells = (json.load(open(cells_path))
             if os.path.exists(cells_path) else {})
    curve = json.load(open(CURVE))

    for mult in mults:
        for name in names:
            if only and name not in only:
                continue
            key = f"{name}@{args.rate}xlr{mult}"
            if key in cells:
                print(f"skip {key} ({cells[key]['cm']} cm)", flush=True)
                continue
            cfg_d = json.load(open(os.path.join(SOLO, name,
                                                "config.json")))
            cfg = config_from_dict(cfg_d).replace(do_eval=False)
            cfg = cfg.replace(lr=cfg.lr * mult)
            tr = Trainer(cfg, seed=int(cfg_d["seed"]))
            tr._per_step_device_s = 1.0 / args.rate
            tr._bill_exact = True
            res = train_loop(tr, log_fn=None)
            ev = eval_sdf(tr, visible_region=True,
                          seed=int(tr.tot_step_time * 1e3))
            cm = float(ev["av_l1"]) * 100
            cells[key] = {"cm": round(cm, 3), "steps": res.steps,
                          "t_sim_s": round(tr.tot_step_time, 2)}
            print(f"{key}: {cm:.2f} cm ({res.steps} steps)", flush=True)
            with open(cells_path, "w") as f:
                json.dump(cells, f, indent=2)
            del tr

    summary = {"rate": args.rate, "mults": {}, "anchors": {
        "lr1.0@633": "quality_compute_curve cells @633",
        "lr1.0@123": "quality_compute_curve cells @123"}}
    for mult in mults:
        vals, d633, d123 = [], [], []
        per = {}
        for name in names:
            c = cells.get(f"{name}@{args.rate}xlr{mult}")
            if not c:
                continue
            per[name] = c["cm"]
            vals.append(c["cm"])
            a, b = curve.get(f"{name}@633"), curve.get(f"{name}@123")
            if a:
                d633.append(c["cm"] - a["cm"])
            if b:
                d123.append(c["cm"] - b["cm"])
        if not vals:
            continue

        def ms(x):
            x = np.asarray(x)
            return (round(float(x.mean()), 3),
                    round(float(x.std(ddof=1) / np.sqrt(len(x))), 3))

        m, s = ms(vals)
        summary["mults"][str(mult)] = {
            "n": len(vals), "mean_cm": m, "sem_cm": s,
            "paired_delta_vs_lr1_at_633": ms(d633) if d633 else None,
            "paired_delta_vs_lr1_at_123": ms(d123) if d123 else None,
            "per_run_cm": per}
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["mults"], indent=2))


if __name__ == "__main__":
    main()
