#!/usr/bin/env python
"""K=4 shared-chip quality at HALF rays: probe the knee with the
rays-vs-steps invariance (VERDICT r4 item 4).

K=4 at the campaign workload (n_rays=200) costs +0.59 cm paired vs solo
(experiments/multi_scene_k4) while K=2 is free. The repo's own
rays-halving invariance (experiments/quality_2x_rays: 2x rays at half
the steps is quality-neutral, -0.05 +/- 0.11 cm) predicts the K=4 cost
is a STEP-RATE effect, not a supervision-rate effect: at n_rays=100
each step bills ~half the device time, so the same joint program runs
~2x the steps/s — putting each scene back at ~123 effective steps/s,
the regime where K=2 showed no paired cost.

If the prediction holds, K=4 robots per chip is free at half rays; if
it fails, the knee is a step-rate knee and the deployment guidance
stays "2 scenes/chip at full quality".

Usage: python experiments/run_multi_scene_k4_r100.py [out_root]
Writes <out_root>/summary.json with paired deltas vs solo, vs K=4@200,
and vs K=2@200.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/multi_scene_k4_r100")
SOLO = "/root/repo/experiments/round4_campaign"
K4_FULL = "/root/repo/experiments/multi_scene_k4/summary.json"
K2 = "/root/repo/experiments/multi_scene_quality/summary.json"

GROUP = ["room_a_0", "room_b_0", "room_c_0", "room_a_1"]


def main():
    import numpy as np

    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.parallel.multi_scene import multi_scene_loop
    from isdf_tpu.utils.config import config_from_dict

    solo_finals = json.load(
        open(os.path.join(SOLO, "paired_summary.json")))["round4"]
    k4_full = json.load(open(K4_FULL))["scenes"]
    k2 = {}
    for pair in json.load(open(K2))["pairs"]:
        k2.update({n: s["joint_cm"] for n, s in pair["scenes"].items()})
    os.makedirs(OUT, exist_ok=True)

    trainers = []
    for name in GROUP:
        cfg_d = json.load(open(os.path.join(SOLO, name, "config.json")))
        cfg_d.setdefault("tpu", {})["steps_per_bundle"] = 10
        # the knob under test: half the supervision per step
        cfg_d["sample"]["n_rays"] = 100
        cfg_d["sample"]["n_rays_is_kf"] = 200
        trainers.append(Trainer(config_from_dict(cfg_d),
                                seed=int(cfg_d["seed"])))
    print(f"=== joint K=4 @ n_rays=100: {' + '.join(GROUP)} ===",
          flush=True)
    out = multi_scene_loop(trainers,
                           log_fn=lambda m: print(m, flush=True))

    summary = {"group": GROUP, "scenes": {}, "protocol":
               "round4_campaign configs with sample.n_rays 200->100 "
               "(is_kf 400->200), 4-scene joint bundles, "
               "steps_per_bundle=10, device-time clock"}
    for name, tr, o in zip(GROUP, trainers, out):
        ev = eval_sdf(tr, visible_region=True,
                      seed=int(tr.tot_step_time * 1e3))
        cm = ev["av_l1"] * 100
        summary["scenes"][name] = {
            "joint_r100_cm": round(cm, 3),
            "solo_cm": round(solo_finals[name], 3),
            "k4_r200_cm": k4_full[name]["joint_cm"],
            "k2_r200_cm": k2.get(name),
            "delta_vs_solo_cm": round(cm - solo_finals[name], 3),
            "delta_vs_k4_r200_cm": round(
                cm - k4_full[name]["joint_cm"], 3),
            "steps": o["steps"],
            "t_sim_s": round(tr.tot_step_time, 2),
            "steps_per_sec_effective": round(
                o["steps"] / max(tr.tot_step_time, 1e-9), 1)}
        s = summary["scenes"][name]
        print(f"  {name}: r100 {cm:.2f} cm | solo {s['solo_cm']:.2f} | "
              f"K4@200 {s['k4_r200_cm']:.2f} | "
              f"{s['steps_per_sec_effective']:.0f} steps/s eff",
              flush=True)

    d_solo = np.asarray([s["delta_vs_solo_cm"]
                         for s in summary["scenes"].values()])
    d_k4 = np.asarray([s["delta_vs_k4_r200_cm"]
                       for s in summary["scenes"].values()])
    summary["mean_delta_vs_solo_cm"] = round(float(d_solo.mean()), 3)
    summary["mean_delta_vs_k4_r200_cm"] = round(float(d_k4.mean()), 3)
    rate = np.mean([s["steps_per_sec_effective"]
                    for s in summary["scenes"].values()])
    summary["mean_steps_per_sec_effective"] = round(float(rate), 1)
    summary["prediction_held"] = bool(
        d_k4.mean() < 0 and abs(d_solo.mean()) <
        abs(json.load(open(K4_FULL))["mean_delta_cm"]))
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"K=4@r100: {rate:.0f} steps/s eff/scene, "
          f"delta vs solo {d_solo.mean():+.2f} cm "
          f"(K4@r200 was {json.load(open(K4_FULL))['mean_delta_cm']:+.2f}), "
          f"delta vs K4@r200 {d_k4.mean():+.2f} cm")


if __name__ == "__main__":
    main()
