#!/usr/bin/env python
"""Does the ensemble win COMPOUND? 4 members at half rays vs 2 members
vs solo, at equal chip-seconds (VERDICT r4 item 7).

Round 4 showed 2-seed same-scene ensembles beat the member mean 3/3
(experiments/ensemble_quality, mean -0.17 cm vs solo). This experiment
trains FOUR seeds of the same scene in one K=4 joint program at
n_rays=100 (the rays-halving regime of run_multi_scene_k4_r100, which
keeps each member near the ~123 effective steps/s rate where K=2
members match solo quality) and scores the 4-way averaged prediction.
Chip-seconds are equal by construction: one chip, time-shared.

Also checks whether UNIFORM averaging is optimal: fits the best convex
member weights by least squares on a held-out half of the eval points
and scores them on the other half; if the fitted weights beat uniform
beyond noise, serve.py's EnsembleEngine should gain weighted averaging.

Usage: python experiments/run_ensemble4.py [out_root]
Writes <out_root>/summary.json.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/ensemble4")
SOLO = "/root/repo/experiments/round4_campaign"
ENS2 = "/root/repo/experiments/ensemble_quality/summary.json"

# base config run -> 3 partner seeds (base seed makes member 4);
# partner seeds disjoint from every prior campaign/ensemble seed
QUADS = [("room_a_0", [10, 20, 30]),
         ("room_b_0", [11, 21, 31]),
         ("room_c_0", [12, 22, 32])]


def main():
    import numpy as np

    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import _visible_region_pts
    from isdf_tpu.parallel.multi_scene import multi_scene_loop
    from isdf_tpu.utils.config import config_from_dict

    solo_finals = json.load(
        open(os.path.join(SOLO, "paired_summary.json")))["round4"]
    ens2 = {p["name"]: p["ensemble_cm"]
            for p in json.load(open(ENS2))["pairs"]}
    os.makedirs(OUT, exist_ok=True)
    summary = {"quads": [], "protocol":
               "round4_campaign configs with sample.n_rays 200->100 "
               "(is_kf 400->200); 4 seeds of the SAME scene per joint "
               "program, steps_per_bundle=10, device-time clock; eval "
               "= mean of the four maps' SDF at 200k visible-region "
               "points; weighted variant fit on a held-out half"}

    for name, extra_seeds in QUADS:
        cfg_d = json.load(open(os.path.join(SOLO, name, "config.json")))
        cfg_d.setdefault("tpu", {})["steps_per_bundle"] = 10
        cfg_d["sample"]["n_rays"] = 100
        cfg_d["sample"]["n_rays_is_kf"] = 200
        cfg = config_from_dict(cfg_d)
        seeds = [int(cfg_d["seed"])] + list(extra_seeds)
        trs = [Trainer(cfg, seed=s) for s in seeds]
        print(f"=== ensemble4 {name}: seeds {seeds} ===", flush=True)
        out = multi_scene_loop(trs, log_fn=lambda m: print(m, flush=True))

        rng = np.random.default_rng(int(trs[0].tot_step_time * 1e3))
        pts = _visible_region_pts(trs[0], 200000, rng)
        gt = np.asarray(trs[0].gt_sdf_fn(pts)).reshape(-1)
        valid = np.isfinite(gt) & (gt != 0.0)
        pts, gt = pts[valid], gt[valid]
        preds = np.stack([np.asarray(tr.sdf_fn(pts)).reshape(-1)
                          for tr in trs])            # [4, N]
        member_cm = np.abs(preds - gt).mean(axis=1) * 100
        ens4_cm = float(np.abs(preds.mean(axis=0) - gt).mean()) * 100
        ens2_of4_cm = float(
            np.abs(preds[:2].mean(axis=0) - gt).mean()) * 100

        # held-out weighted averaging: lstsq simplex-projected weights
        n = gt.size
        half = n // 2
        A, b = preds[:, :half].T, gt[:half]
        w, *_ = np.linalg.lstsq(A, b, rcond=None)
        w = np.clip(w, 0.0, None)
        w = w / w.sum() if w.sum() > 0 else np.full(4, 0.25)
        wtd_cm = float(
            np.abs(w @ preds[:, half:] - gt[half:]).mean()) * 100
        unif_half_cm = float(
            np.abs(preds[:, half:].mean(axis=0) - gt[half:]).mean()) * 100

        solo = solo_finals[name]
        rec = {"name": name, "seeds": seeds,
               "member_cm": [round(float(c), 3) for c in member_cm],
               "ens4_cm": round(ens4_cm, 3),
               "ens2_of4_cm": round(ens2_of4_cm, 3),
               "ens2_r200_cm": ens2.get(name),
               "solo_cm": round(solo, 3),
               "delta_vs_solo_cm": round(ens4_cm - solo, 3),
               "delta_vs_member_mean_cm": round(
                   ens4_cm - float(member_cm.mean()), 3),
               "delta_vs_ens2_r200_cm": round(
                   ens4_cm - ens2[name], 3) if name in ens2 else None,
               "weighted_holdout_cm": round(wtd_cm, 3),
               "uniform_holdout_cm": round(unif_half_cm, 3),
               "fitted_weights": [round(float(x), 3) for x in w],
               "t_sim_s": round(trs[0].tot_step_time, 2),
               "steps_per_sec_effective": round(
                   out[0]["steps"] / max(trs[0].tot_step_time, 1e-9), 1)}
        summary["quads"].append(rec)
        print(f"  members {np.round(member_cm, 2)} -> ens4 "
              f"{ens4_cm:.2f} cm (solo {solo:.2f}, ens2@200 "
              f"{ens2.get(name)}, weighted-holdout {wtd_cm:.2f} vs "
              f"uniform-holdout {unif_half_cm:.2f})", flush=True)
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        del trs

    d_solo = np.asarray([q["delta_vs_solo_cm"] for q in summary["quads"]])
    d_e2 = np.asarray([q["delta_vs_ens2_r200_cm"]
                       for q in summary["quads"]
                       if q["delta_vs_ens2_r200_cm"] is not None])
    d_w = np.asarray([q["weighted_holdout_cm"] - q["uniform_holdout_cm"]
                      for q in summary["quads"]])
    summary["mean_delta_vs_solo_cm"] = round(float(d_solo.mean()), 3)
    summary["mean_delta_vs_ens2_r200_cm"] = round(float(d_e2.mean()), 3)
    summary["mean_weighted_minus_uniform_cm"] = round(float(d_w.mean()), 3)
    summary["verdict"] = (
        ("ENSEMBLE-4 COMPOUNDS (beats ens2)" if d_e2.mean() < 0 else
         "ensemble-4 does NOT beat ens2")
        + ("; weighted averaging helps" if d_w.mean() < -0.02 else
           "; uniform averaging is fine"))
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"ens4 vs solo {d_solo.mean():+.2f} cm, vs ens2@200 "
          f"{d_e2.mean():+.2f} cm, weighted-uniform {d_w.mean():+.3f} cm"
          f" -> {summary['verdict']}")


if __name__ == "__main__":
    main()
