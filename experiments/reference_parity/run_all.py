#!/usr/bin/env python
"""Drive the full step-budget quality A/B: {reference, ours} x scenes x
seeds, sequentially on CPU (clock-free, so host speed is irrelevant).

Usage: python run_all.py [out_dir] [--scenes room_a,room_b] [--seeds 0,1]
Writes <out_dir>/<system>_<scene>_<seed>.json + summary.json.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?",
                    default=os.path.join(HERE, "results"))
    ap.add_argument("--scenes", default="room_a,room_b")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--bounds-method", default="pc")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    jobs = []
    for scene in args.scenes.split(","):
        for seed in args.seeds.split(","):
            for system, script in (("ref", "run_ref.py"),
                                   ("ours", "run_ours.py")):
                out = os.path.join(args.out_dir,
                                   f"{system}_{scene}_{seed}.json")
                jobs.append((system, scene, seed, script, out))

    for system, scene, seed, script, out in jobs:
        if os.path.exists(out):
            print(f"skip {out} (exists)")
            continue
        print(f"=== {system} {scene} seed {seed} ===", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, script), scene, seed, out,
             "--bounds-method", args.bounds_method],
            cwd=HERE)
        if r.returncode != 0:
            print(f"FAILED: {system} {scene} {seed}")

    summary = {}
    for system, scene, seed, _, out in jobs:
        if not os.path.exists(out):
            continue
        d = json.load(open(out))
        summary[f"{system}_{scene}_{seed}"] = {
            "final_vis_cm": d["final_vis_cm"],
            "final_vol_cm": d["final_vol_cm"],
            "steps": d["steps"], "n_kf": len(d["kf_ids"]),
            "wall_s": round(d["wall_s"], 1)}
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
