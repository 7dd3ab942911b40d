#!/usr/bin/env python
"""Ensemble-on-one-chip: can TWO seeds of the SAME scene, trained
jointly on one chip and averaged at query time, beat one solo map?

Mechanism: the shared-chip experiment (run_multi_scene_quality)
showed a joint-trained map loses nothing vs a solo map — halving
supervision/second does not move final quality at this workload. If
the residual error of two independently-seeded maps is partly
seed-noise (sampling draws, init), averaging their SDF predictions
should cancel some of it. The multi-scene machinery makes the
experiment free: train (scene, seed s) and (scene, seed s') as a
2-scene joint program under the honest shared-chip clock, then score
the AVERAGED prediction — same chip-seconds as one reference GPU run.

Paired comparison per campaign config (scene, seed): ensemble MAE vs
the solo round4_campaign final. Also reports the members' individual
MAEs (each should match solo, reproducing the NO-COST result).

Usage: python experiments/run_ensemble_quality.py [out_root]
Writes <out_root>/summary.json.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/ensemble_quality")
SOLO = "/root/repo/experiments/round4_campaign"

# (config run to load, partner seed): partner = same scene, different
# seed, NOT present in the solo campaign pairing to keep seeds fresh
PAIRS = [("room_a_0", 10), ("room_b_0", 11), ("room_c_0", 12)]


def main():
    import numpy as np

    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import _visible_region_pts
    from isdf_tpu.parallel.multi_scene import multi_scene_loop
    from isdf_tpu.utils.config import config_from_dict

    solo_finals = json.load(
        open(os.path.join(SOLO, "paired_summary.json")))["round4"]
    os.makedirs(OUT, exist_ok=True)
    summary = {"pairs": [], "protocol": "round4_campaign configs; "
               "2 seeds of the SAME scene per joint program, "
               "steps_per_bundle=10, device-time clock; eval = mean of "
               "the two maps' SDF at 200k visible-region points"}

    for name, seed_b in PAIRS:
        cfg_d = json.load(open(os.path.join(SOLO, name, "config.json")))
        cfg_d.setdefault("tpu", {})["steps_per_bundle"] = 10
        cfg = config_from_dict(cfg_d)
        seed_a = int(cfg_d["seed"])
        tr_a = Trainer(cfg, seed=seed_a)
        tr_b = Trainer(cfg, seed=seed_b)
        print(f"=== ensemble {name}: seeds {seed_a}+{seed_b} ===",
              flush=True)
        multi_scene_loop([tr_a, tr_b],
                         log_fn=lambda m: print(m, flush=True))

        rng = np.random.default_rng(int(tr_a.tot_step_time * 1e3))
        pts = _visible_region_pts(tr_a, 200000, rng)
        gt = np.asarray(tr_a.gt_sdf_fn(pts)).reshape(-1)
        valid = np.isfinite(gt) & (gt != 0.0)
        pts, gt = pts[valid], gt[valid]
        pa, pb = tr_a.sdf_fn(pts), tr_b.sdf_fn(pts)
        mae_a = float(np.abs(pa - gt).mean()) * 100
        mae_b = float(np.abs(pb - gt).mean()) * 100
        mae_ens = float(np.abs(0.5 * (pa + pb) - gt).mean()) * 100
        solo = solo_finals[name]
        rec = {"name": name, "seeds": [seed_a, seed_b],
               "member_a_cm": round(mae_a, 3),
               "member_b_cm": round(mae_b, 3),
               "ensemble_cm": round(mae_ens, 3),
               "solo_cm": round(solo, 3),
               "delta_vs_solo_cm": round(mae_ens - solo, 3),
               "delta_vs_best_member_cm": round(
                   mae_ens - min(mae_a, mae_b), 3),
               "t_sim_s": round(tr_a.tot_step_time, 2)}
        summary["pairs"].append(rec)
        print(f"  members {mae_a:.2f} / {mae_b:.2f} cm -> ensemble "
              f"{mae_ens:.2f} cm (solo {solo:.2f}, "
              f"{mae_ens - solo:+.2f})", flush=True)
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        del tr_a, tr_b

    d = np.asarray([p["delta_vs_solo_cm"] for p in summary["pairs"]])
    summary["mean_delta_vs_solo_cm"] = round(float(d.mean()), 3)
    summary["verdict"] = (
        "ENSEMBLE WINS" if (d < 0).all() else
        "ensemble loses" if (d > 0).all() else "mixed")
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"mean delta vs solo {d.mean():+.2f} cm -> "
          f"{summary['verdict']}")


if __name__ == "__main__":
    main()
