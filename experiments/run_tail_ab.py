#!/usr/bin/env python
"""A/B the refinement-tail settling levers (tail lr decay + tail window).

Usage: python experiments/run_tail_ab.py OUT_DIR scene:seed[,scene:seed...] \
           [key=val ...]
Overrides use config-dict paths, e.g. tpu.tail_lr_min=1.0
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    from isdf_tpu.train.batch import run_jobs, set_params

    out = sys.argv[1]
    pairs = [p.split(":") for p in sys.argv[2].split(",")]
    overrides = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except ValueError:
            pass
        overrides[k] = v

    jobs = []
    for scene, seed in pairs:
        base = json.load(open(
            f"/root/repo/experiments/round1_final/{scene}_0/config.json"))
        base["model"].pop("grad_mode", None)
        cfg = set_params(base, overrides)
        cfg["seed"] = int(seed)
        jobs.append((cfg, f"{scene}_{seed}"))
    run_jobs(jobs, out)

    for _, name in jobs:
        p = os.path.join(out, name, "res.json")
        r = json.load(open(p))
        ev = r["sdf_eval"]
        last = ev[sorted(ev.keys(), key=float)[-1]]
        print(f"{name}: {last['rays']['av_l1']*100:.2f} cm "
              f"@ t={last['time']:.1f}s")


if __name__ == "__main__":
    main()
