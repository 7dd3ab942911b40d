#!/usr/bin/env python
"""Multi-scene QUALITY on one chip: do two concurrently-mapped scenes
still land in the reference's quality regime?

Protocol: three seed-matched PAIRS of round4_campaign runs (320x240
camera, 200 rays, pc bounds, active sampling — the campaign protocol)
train jointly via parallel/multi_scene.py under the REAL device-time
clock: each scene is billed the full joint bundle time, so ingestion
outpaces optimisation exactly as it would when two robots time-share
one chip (~half the optimisation steps per frame vs solo). Final
visible-region MAE per scene is compared PAIRED against the same
(scene, seed)'s solo result from experiments/round4_campaign.

tpu.steps_per_bundle=10 pins every joint bundle to one compiled shape
(all loop budgets are multiples of 10); bundling does not change the
per-step math, only the RNG key split points — a seed-level, not
systematic, difference.

Expected: a positive MAE delta (each scene gets ~half the
supervision/second) — the question is whether the shared-chip runs
stay within the reference's own regime (3.4-4.5 cm means,
experiments/reference_parity) while the reference architecture would
need a second GPU.

Usage: python experiments/run_multi_scene_quality.py [out_root]
Writes <out_root>/summary.json + per-scene res.json.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/multi_scene_quality")
SOLO = "/root/repo/experiments/round4_campaign"

PAIRS = [("room_a_0", "room_b_0"),
         ("room_a_1", "room_c_0"),
         ("room_b_1", "room_c_1")]


def main():
    import numpy as np

    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.parallel.multi_scene import multi_scene_loop
    from isdf_tpu.utils.config import config_from_dict

    solo_finals = json.load(
        open(os.path.join(SOLO, "paired_summary.json")))["round4"]
    os.makedirs(OUT, exist_ok=True)
    summary = {"pairs": [], "protocol": "round4_campaign configs, "
               "joint 2-scene bundles, steps_per_bundle=10, "
               "device-time clock"}

    for name_a, name_b in PAIRS:
        trainers, names = [], (name_a, name_b)
        for name in names:
            cfg_d = json.load(
                open(os.path.join(SOLO, name, "config.json")))
            cfg_d.setdefault("tpu", {})["steps_per_bundle"] = 10
            cfg = config_from_dict(cfg_d)
            trainers.append(Trainer(cfg, seed=int(cfg_d["seed"])))
        print(f"=== joint pair {name_a} + {name_b} ===", flush=True)
        out = multi_scene_loop(trainers,
                               log_fn=lambda m: print(m, flush=True))

        rec = {"scenes": {}, "pair": list(names)}
        for name, tr, o in zip(names, trainers, out):
            ev = eval_sdf(tr, visible_region=True,
                          seed=int(tr.tot_step_time * 1e3))
            cm = ev["av_l1"] * 100
            solo = solo_finals[name]
            rec["scenes"][name] = {
                "joint_cm": round(cm, 3),
                "solo_cm": round(solo, 3),
                "delta_cm": round(cm - solo, 3),
                "steps": o["steps"],
                "t_sim_s": round(tr.tot_step_time, 2),
                "steps_per_sec_effective": round(
                    o["steps"] / max(tr.tot_step_time, 1e-9), 1),
                "n_keyframes": o["n_keyframes"],
            }
            print(f"  {name}: joint {cm:.2f} cm vs solo {solo:.2f} cm "
                  f"({cm - solo:+.2f}); {o['steps']} steps in "
                  f"{tr.tot_step_time:.1f}s sim", flush=True)
            sdir = os.path.join(OUT, name)
            os.makedirs(sdir, exist_ok=True)
            with open(os.path.join(sdir, "res.json"), "w") as f:
                json.dump({"sdf_eval": {o["steps"]: {
                    "time": tr.tot_step_time, "rays": ev}},
                    **rec["scenes"][name]}, f, indent=4)
        summary["pairs"].append(rec)
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        del trainers

    all_scenes = [s for p in summary["pairs"]
                  for s in p["scenes"].values()]
    joint = [s["joint_cm"] for s in all_scenes]
    deltas = [s["delta_cm"] for s in all_scenes]
    summary["joint_mean_cm"] = round(float(np.mean(joint)), 3)
    summary["mean_delta_cm"] = round(float(np.mean(deltas)), 3)
    d = np.asarray(deltas)
    sem = float(d.std(ddof=1) / np.sqrt(len(d)))
    pos, neg = int((d > 0).sum()), int((d < 0).sum())
    cost = (max(pos, neg) >= len(d) - 1 and len(d) >= 6) or \
        abs(d.mean()) > 2 * sem
    summary["paired_verdict"] = (
        f"mean {d.mean():+.2f} cm (sem {sem:.2f}), sign {pos}+/{neg}- "
        f"-> " + ("QUALITY COST" if cost and d.mean() > 0 else
                  "QUALITY GAIN" if cost else
                  "NO COST (deltas straddle zero / mean within 2 sem)"))
    summary["all_within_reference_regime_4p5cm"] = bool(
        max(joint) <= 4.5)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"joint mean {summary['joint_mean_cm']} cm, "
          f"mean delta {summary['mean_delta_cm']:+.2f} cm vs solo, "
          f"max {max(joint):.2f} cm "
          f"(reference regime <= 4.5 cm: "
          f"{summary['all_within_reference_regime_4p5cm']})")


if __name__ == "__main__":
    main()
