#!/usr/bin/env python
"""Multi-scene training CLI: K scenes, ONE chip, one device program.

    python -m isdf_tpu.train.train_multi \
        --config sceneA.json --config sceneB.json \
        [--save_path DIR] [--max_steps N] [--seed S] [--set K=V]

The reference architecture maps one scene per process per GPU
(isdf/train/train.py:282-358); this CLI time-shares ONE TPU chip
across K independent scenes via the joint lockstep bundle
(parallel/multi_scene.py). Each scene gets its own config, dataset,
seed (``--seed`` + scene index) and keyframe state machine; the
simulated clock bills every scene the FULL joint device time, so a
run is real-time iff each scene's step rate still clears the
sequence's ingestion budget.

Artifacts: per-scene ``<save_path>/scene_<i>/`` with the scene's
config.json and a res.json holding the final visible-region SDF eval
(same schema as the single-scene loop's final entry).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="isdf_tpu multi-scene trainer")
    parser.add_argument("--config", action="append", required=True,
                        dest="configs", metavar="CFG.json",
                        help="one per scene (repeat); scenes must share "
                             "the step-program signature (camera, model, "
                             "ray/sample counts — see parallel/"
                             "multi_scene._HOT_FIELDS)")
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_time_s", type=float, default=None,
                        help="stop once every scene's simulated clock "
                             "passes this (clocks are shared-chip, so "
                             "they advance together)")
    parser.add_argument("--seed", type=int, default=1,
                        help="scene i trains with seed+i")
    parser.add_argument("--extra_opt_steps", type=int, default=400)
    parser.add_argument("--set", action="append", dest="overrides",
                        metavar="SECTION.KEY=VALUE",
                        help="override a config entry in EVERY scene "
                             "(repeatable)")
    args = parser.parse_args(argv)

    from isdf_tpu.utils.jax_setup import honor_platform_env
    honor_platform_env()

    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.parallel.multi_scene import multi_scene_loop
    from isdf_tpu.utils.config import load_config

    trainers = []
    for i, path in enumerate(args.configs):
        cfg = load_config(path, overrides=args.overrides)
        trainers.append(Trainer(cfg, seed=args.seed + i))
        if args.save_path:
            sdir = os.path.join(args.save_path, f"scene_{i}")
            os.makedirs(sdir, exist_ok=True)
            with open(os.path.join(sdir, "config.json"), "w") as f:
                with open(path) as src:
                    json.dump(json.load(src), f, indent=4)

    out = multi_scene_loop(
        trainers, max_steps=args.max_steps,
        max_time_s=args.max_time_s,
        extra_opt_steps=args.extra_opt_steps,
        log_fn=lambda m: print(m, flush=True))

    from isdf_tpu.eval.protocol import eval_sdf
    for i, tr in enumerate(trainers):
        summary = dict(out[i])
        if tr.cfg.do_eval and tr.gt_sdf_fn is not None:
            ev = eval_sdf(tr, visible_region=True,
                          seed=int(tr.tot_step_time * 1e3))
            summary["sdf_eval"] = {out[i]["steps"]: {
                "time": tr.tot_step_time, "rays": ev}}
            print(f"scene {i}: {out[i]['steps']} steps, "
                  f"t_sim={tr.tot_step_time:.1f}s, "
                  f"visible MAE {ev['av_l1'] * 100:.2f} cm", flush=True)
        else:
            print(f"scene {i}: {out[i]['steps']} steps, "
                  f"t_sim={tr.tot_step_time:.1f}s", flush=True)
        if args.save_path:
            sdir = os.path.join(args.save_path, f"scene_{i}")
            with open(os.path.join(sdir, "res.json"), "w") as f:
                json.dump(summary, f, indent=4)
            # each scene's map ships alone: full-state checkpoint is
            # loadable by serve.py / train.py --load_checkpoint
            from isdf_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(os.path.join(sdir, "final.ckpt"), tr,
                            step=out[i]["steps"])
    return out


if __name__ == "__main__":
    main()
