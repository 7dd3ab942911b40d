#!/usr/bin/env python
"""Pose-refinement A/B under tracker drift (roadmap item 9).

Scenario: the synthetic dataset reports random-walk-perturbed poses
(dataset.pose_noise_std, mode "walk") while depth renders from the true
pose — the drifting-tracker case. Arms: model.refine_poses off vs on
(LM SDF tracking: engine/pose.py bursts after each ingested frame,
billed to the sim clock). Equal protocol otherwise; final visible MAE
decides (absolute pose error is gauge-limited, see
tests/test_e2e.py::test_e2e_loop_with_pose_refinement_under_drift).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/experiments/pose_ab"
NOISE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.002


def main():
    from isdf_tpu.train.batch import run_jobs

    jobs = []
    for scene in ("room_a", "room_b"):
        base = json.load(open(
            f"/root/repo/experiments/round2d/{scene}_0/config.json"))
        base["dataset"]["pose_noise_std"] = NOISE
        base["dataset"]["pose_noise_mode"] = "walk"
        for refine in (0, 1):
            cfg = json.loads(json.dumps(base))
            cfg["model"]["refine_poses"] = refine
            cfg["seed"] = 0
            jobs.append((cfg, f"{scene}_refine{refine}"))
    run_jobs(jobs, OUT)

    print("=== pose A/B summary (noise std %.3f) ===" % NOISE)
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
