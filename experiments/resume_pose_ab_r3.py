#!/usr/bin/env python
"""Resume the interrupted pose_ab_r3 campaign: rerun the two
heavy_room_b_s0 jobs the dead session left unfinished, then print the
full-grid summary (same format as run_pose_ab_gated.py)."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/pose_ab_r3"


def main():
    from isdf_tpu.train.batch import run_jobs

    base = json.load(open(
        "/root/repo/experiments/round2d/room_b_0/config.json"))
    base["dataset"]["pose_noise_std"] = 0.006
    base["dataset"]["pose_noise_mode"] = "walk"
    jobs = []
    for refine in (0, 1):
        cfg = json.loads(json.dumps(base))
        cfg["model"]["refine_poses"] = refine
        cfg["seed"] = 0
        jobs.append((cfg, f"heavy_room_b_s0_refine{refine}"))
    run_jobs(jobs, OUT)

    print("=== gated pose A/B summary (full grid) ===")
    for name in sorted(os.listdir(OUT)):
        p = os.path.join(OUT, name, "res.json")
        if not os.path.isfile(p):
            continue
        r = json.load(open(p))
        ev = r["sdf_eval"]
        last = ev[sorted(ev.keys(), key=float)[-1]]
        print(f"{name}: {last['rays']['av_l1']*100:.2f} cm "
              f"@ t={last['time']:.1f}s")


if __name__ == "__main__":
    main()
