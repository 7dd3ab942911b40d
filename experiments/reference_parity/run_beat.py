#!/usr/bin/env python
"""Head-to-head quality A/B: OUR FULL STACK vs the executed reference
(VERDICT r4 item 1).

Pairs >= 6 seed-matched (scene, seed) runs of the reference Trainer at
its best shipped settings against our engine with its shipped quality
extras ON (see run_ours_full.py), equal clock-free step budget, one
shared external Evaluator. Reference runs are reused from results/ when
present (they are deterministic per (scene, seed) and expensive: ~55 min
each on this 1-core host); missing ones are run.

Decision rule (printed + beat_summary.json): paired deltas
d_i = ours_full_i - ref_i on final visible-region MAE (cm).
  WIN   if (all-but-<=1 of n deltas < 0 and n >= 6; two-sided sign test
        p <= 0.22 at 5/6, 0.031 at 6/6) AND mean(d) < 0, or
        mean(d) < -2 * sem(d).
  LOSS  symmetric.
  NULL  otherwise (honest null redirects the quality roadmap).

Usage: python run_beat.py [--scenes room_a,room_b,room_c] [--seeds 0,1]
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_DIR = os.path.join(HERE, "results")
FULL_DIR = os.path.join(HERE, "results_full")


def ensure(script, scene, seed, out):
    if os.path.exists(out):
        print(f"skip {out} (exists)", flush=True)
        return True
    print(f"=== {script} {scene} seed {seed} ===", flush=True)
    r = subprocess.run([sys.executable, os.path.join(HERE, script),
                        scene, str(seed), out], cwd=HERE)
    return r.returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="room_a,room_b,room_c")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--skip-runs", action="store_true",
                    help="only (re)compute the summary from existing jsons")
    args = ap.parse_args()
    os.makedirs(FULL_DIR, exist_ok=True)

    pairs = [(sc, int(sd)) for sc in args.scenes.split(",")
             for sd in args.seeds.split(",")]

    if not args.skip_runs:
        # ours-full first (cheap, ~5-10 min each), then missing refs
        for sc, sd in pairs:
            ensure("run_ours_full.py", sc, sd,
                   os.path.join(FULL_DIR, f"ours_full_{sc}_{sd}.json"))
        for sc, sd in pairs:
            ensure("run_ref.py", sc, sd,
                   os.path.join(REF_DIR, f"ref_{sc}_{sd}.json"))

    import numpy as np
    rows, deltas_vis, deltas_vol = [], [], []
    for sc, sd in pairs:
        fr = os.path.join(REF_DIR, f"ref_{sc}_{sd}.json")
        fo = os.path.join(FULL_DIR, f"ours_full_{sc}_{sd}.json")
        if not (os.path.exists(fr) and os.path.exists(fo)):
            print(f"missing pair {sc} {sd}")
            continue
        ref = json.load(open(fr))
        ours = json.load(open(fo))
        dv = ours["final_vis_cm"] - ref["final_vis_cm"]
        dq = ours["final_vol_cm"] - ref["final_vol_cm"]
        rows.append({"scene": sc, "seed": sd,
                     "ref_vis_cm": round(ref["final_vis_cm"], 3),
                     "ours_full_vis_cm": round(ours["final_vis_cm"], 3),
                     "delta_vis_cm": round(dv, 3),
                     "ref_vol_cm": round(ref["final_vol_cm"], 3),
                     "ours_full_vol_cm": round(ours["final_vol_cm"], 3),
                     "delta_vol_cm": round(dq, 3)})
        deltas_vis.append(dv)
        deltas_vol.append(dq)

    def verdict(d):
        d = np.asarray(d, float)
        n = len(d)
        neg = int((d < 0).sum())
        pos = n - neg
        sem = d.std(ddof=1) / np.sqrt(n) if n > 1 else float("inf")
        from math import comb
        k = max(pos, neg)
        p_sign = min(1.0, 2 * sum(comb(n, i) for i in range(k, n + 1))
                     / 2 ** n)
        win = ((neg >= n - 1 and n >= 6) and d.mean() < 0) \
            or d.mean() < -2 * sem
        loss = ((pos >= n - 1 and n >= 6) and d.mean() > 0) \
            or d.mean() > 2 * sem
        call = "WIN" if win else ("LOSS" if loss else "NULL")
        return {"n": n, "mean_cm": round(float(d.mean()), 3),
                "sem_cm": round(float(sem), 3), "neg": neg, "pos": pos,
                "sign_test_p": round(p_sign, 4), "call": call}

    summary = {"pairs": rows,
               "vis": verdict(deltas_vis) if deltas_vis else None,
               "vol": verdict(deltas_vol) if deltas_vol else None,
               "protocol": "clock-free FIXED_DT step budget, parity-small "
                           "workload, shared external Evaluator; ours = "
                           "full quality stack (run_ours_full.py), ref = "
                           "shipped replicaCAD.json settings (run_ref.py)"}
    out = os.path.join(HERE, "beat_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
