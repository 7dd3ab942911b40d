#!/usr/bin/env python
"""Round-3 pose A/B: the burst SKIP gate (trainer.should_refine_pose —
bursts only run when the latest keyframe check shows the frame is NOT
already well explained by the map) across the mild+heavy drift grid,
2 seeds (VERDICT r2 item 7).

Arms per (noise, scene, seed): refine_poses off vs on; "on" ships the
default gates (pose_min_rel_improve 0.25 + pose_skip_prop 0.85).

Usage: python experiments/run_pose_ab_gated.py [out_root]
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/pose_ab_r3")

GRID = [
    ("mild", 0.002, "room_a", 0), ("mild", 0.002, "room_a", 1),
    ("mild", 0.002, "room_b", 0),
    ("heavy", 0.006, "room_a", 0), ("heavy", 0.006, "room_a", 1),
    ("heavy", 0.006, "room_b", 0),
]


def main():
    from isdf_tpu.train.batch import run_jobs

    jobs = []
    for tag, noise, scene, seed in GRID:
        base = json.load(open(
            f"/root/repo/experiments/round2d/{scene}_0/config.json"))
        base["dataset"]["pose_noise_std"] = noise
        base["dataset"]["pose_noise_mode"] = "walk"
        for refine in (0, 1):
            cfg = json.loads(json.dumps(base))
            cfg["model"]["refine_poses"] = refine
            cfg["seed"] = seed
            jobs.append((cfg, f"{tag}_{scene}_s{seed}_refine{refine}"))
    run_jobs(jobs, OUT)

    print("=== gated pose A/B summary ===")
    for _, name in jobs:
        p = os.path.join(OUT, name, "res.json")
        try:
            r = json.load(open(p))
            ev = r["sdf_eval"]
            last = ev[sorted(ev.keys(), key=float)[-1]]
            print(f"{name}: {last['rays']['av_l1']*100:.2f} cm "
                  f"@ t={last['time']:.1f}s")
        except Exception as e:
            print(f"{name}: FAILED ({e!r})")


if __name__ == "__main__":
    main()
