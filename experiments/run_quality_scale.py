#!/usr/bin/env python
"""Spend the TPU's throughput surplus on supervision: n_rays x2 under
the SAME real-time simulated clock.

The fixed reference workload (200 rays/kf) runs at ~2.1x real time on
one chip (BENCH_r02/bench.py); the sim clock bills calibrated device
time, so doubling rays/step bills ~1.9x per step and the run takes
~half the optimisation steps inside the same 15-s budget. This A/B
asks whether denser supervision per step beats more steps at the
reference density — i.e. whether the speed surplus converts into map
quality under the reference's own real-time protocol.

Protocol: identical to experiments/run_campaign_r3.py (the
round2e_active configs) with sample.n_rays 200->400 (and the is_kf
burst 400->800, same ratio). Clock billing self-calibrates per run.

Usage: python experiments/run_quality_scale.py [out_root] [--rays-mult M]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SRC = "/root/repo/experiments/round2e_active"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root", nargs="?",
                    default="/root/repo/experiments/quality_2x_rays")
    ap.add_argument("--rays-mult", type=int, default=2)
    ap.add_argument("--only", default=None,
                    help="comma-separated run names (default: all 8)")
    args = ap.parse_args()

    import numpy as np

    from isdf_tpu.train.batch import run_jobs

    only = set(args.only.split(",")) if args.only else None
    jobs = []
    for d in sorted(glob.glob(os.path.join(SRC, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        if only and name not in only:
            continue
        cfg = json.load(open(os.path.join(d, "config.json")))
        cfg["sample"]["n_rays"] *= args.rays_mult
        cfg["sample"]["n_rays_is_kf"] *= args.rays_mult
        jobs.append((cfg, name))
    assert jobs, f"no configs under {SRC}"
    run_jobs(jobs, args.out_root)

    print(f"=== quality scale x{args.rays_mult} summary ===")
    finals = []
    for _, name in jobs:
        p = os.path.join(args.out_root, name, "res.json")
        r = json.load(open(p))
        ev = r["sdf_eval"]
        last = ev[max(ev, key=int)]
        mae = last["rays"]["av_l1"]
        finals.append(mae)
        print(f"{name}: {100 * mae:.2f} cm @ t={last['time']:.1f}s")
    f = np.asarray(finals)
    print(f"mean {100 * f.mean():.2f} cm, max {100 * f.max():.2f} cm, "
          f"runs<=6cm: {(f <= 0.06).sum()}/{len(f)}")


if __name__ == "__main__":
    main()
