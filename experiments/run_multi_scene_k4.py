#!/usr/bin/env python
"""Shared-chip quality at K=4: where does time-sharing start to cost?

K=2 showed NO paired quality cost (run_multi_scene_quality): halving
supervision/second does not move final MAE at this workload. This
experiment quarters it — FOUR campaign scenes in one joint program
under the honest device-time clock (~61 effective steps/s each vs 246
solo) — and scores the same paired final-MAE comparison. Outcome
either extends the headline to four robots per chip or locates the
knee of the quality-vs-K curve.

Usage: python experiments/run_multi_scene_k4.py [out_root]
Writes <out_root>/summary.json.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/multi_scene_k4")
SOLO = "/root/repo/experiments/round4_campaign"

GROUP = ["room_a_0", "room_b_0", "room_c_0", "room_a_1"]


def main():
    import numpy as np

    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.parallel.multi_scene import multi_scene_loop
    from isdf_tpu.utils.config import config_from_dict

    solo_finals = json.load(
        open(os.path.join(SOLO, "paired_summary.json")))["round4"]
    os.makedirs(OUT, exist_ok=True)

    trainers = []
    for name in GROUP:
        cfg_d = json.load(open(os.path.join(SOLO, name, "config.json")))
        cfg_d.setdefault("tpu", {})["steps_per_bundle"] = 10
        trainers.append(Trainer(config_from_dict(cfg_d),
                                seed=int(cfg_d["seed"])))
    print(f"=== joint K=4: {' + '.join(GROUP)} ===", flush=True)
    out = multi_scene_loop(trainers,
                           log_fn=lambda m: print(m, flush=True))

    summary = {"group": GROUP, "scenes": {}, "protocol":
               "round4_campaign configs, 4-scene joint bundles, "
               "steps_per_bundle=10, device-time clock"}
    for name, tr, o in zip(GROUP, trainers, out):
        ev = eval_sdf(tr, visible_region=True,
                      seed=int(tr.tot_step_time * 1e3))
        cm = ev["av_l1"] * 100
        solo = solo_finals[name]
        summary["scenes"][name] = {
            "joint_cm": round(cm, 3), "solo_cm": round(solo, 3),
            "delta_cm": round(cm - solo, 3), "steps": o["steps"],
            "t_sim_s": round(tr.tot_step_time, 2),
            "steps_per_sec_effective": round(
                o["steps"] / max(tr.tot_step_time, 1e-9), 1)}
        print(f"  {name}: joint {cm:.2f} cm vs solo {solo:.2f} "
              f"({cm - solo:+.2f}); {o['steps']} steps in "
              f"{tr.tot_step_time:.1f}s sim", flush=True)

    d = np.asarray([s["delta_cm"] for s in summary["scenes"].values()])
    summary["mean_delta_cm"] = round(float(d.mean()), 3)
    summary["max_joint_cm"] = round(
        max(s["joint_cm"] for s in summary["scenes"].values()), 3)
    summary["all_within_reference_regime_4p5cm"] = bool(
        summary["max_joint_cm"] <= 4.5)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"K=4 mean delta vs solo {d.mean():+.2f} cm, max joint "
          f"{summary['max_joint_cm']:.2f} cm (reference regime <=4.5: "
          f"{summary['all_within_reference_regime_4p5cm']})")


if __name__ == "__main__":
    main()
