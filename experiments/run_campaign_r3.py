#!/usr/bin/env python
"""Round-3 quality campaign: rerun the round2e_active protocol (the
campaign behind the README's 2.82 cm claim — 3 scenes x 2-3 seeds,
active sampling, pc bounds) on the CURRENT engine, whose kernel math
changed in round 3 (merged transcendentals). Honesty check per
docs/ROADMAP.md: rerun the campaign whenever the engine's math changes.

Usage: python experiments/run_campaign_r3.py [out_root]
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/round3_campaign")
SRC = "/root/repo/experiments/round2e_active"


def main():
    import numpy as np

    from isdf_tpu.train.batch import run_jobs

    jobs = []
    for d in sorted(glob.glob(os.path.join(SRC, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        cfg = json.load(open(os.path.join(d, "config.json")))
        jobs.append((cfg, name))
    assert jobs, f"no configs under {SRC}"
    run_jobs(jobs, OUT)

    print("=== round-3 campaign summary ===")
    finals = []
    for _, name in jobs:
        p = os.path.join(OUT, name, "res.json")
        try:
            r = json.load(open(p))
            ev = r["sdf_eval"]
            last = ev[sorted(ev.keys(), key=float)[-1]]
            cm = last["rays"]["av_l1"] * 100
            finals.append(cm)
            print(f"{name}: {cm:.2f} cm @ t={last['time']:.1f}s")
        except Exception as e:
            print(f"{name}: FAILED ({e!r})")
    if finals:
        print(f"mean {np.mean(finals):.2f} cm, max {np.max(finals):.2f} "
              f"cm, runs<=6cm: {sum(f <= 6.0 for f in finals)}"
              f"/{len(finals)}")


if __name__ == "__main__":
    main()
