#!/usr/bin/env python
"""Run OUR engine FULL-STACK (quality extras ON) on the parity protocol.

This is the "matching-or-BEATING" arm (VERDICT r4 item 1): identical
clock-free step budget, scene export, and external Evaluator as
run_ref.py / run_ours.py, but with the quality features we actually ship
enabled instead of disabled-for-parity:

  * active (loss-guided) pixel sampling   — do_active=1, the working
    version of the reference's commented-out active_sample path
    (/root/reference/isdf/modules/trainer.py:456-496)
  * keyframe density kf_pixel_ratio=0.8   — our campaign-shipped value
    (the reference ships 0.65; ratio semantics per trainer.py:627-640)
  * tail lr-anneal + loss-window sampling — tail_lr_min=0.05,
    tail_loss_window=True (our additions; the reference's tail is plain
    extra steps, batch_utils.py:183-201)
  * pc bounds                              — both arms already use pc.

Workload shape (rays/samples/window), step billing (FIXED_DT) and the
evaluator are UNCHANGED from the parity arms, so (scene, seed) pairs are
directly comparable across {ref, ours-parity, ours-full}.

Usage: python run_ours_full.py <preset> <seed> <out_json>
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("seed", type=int)
    ap.add_argument("out_json")
    ap.add_argument("--eval-every-s", type=float, default=1.0)
    ap.add_argument("--bounds-method", default="pc")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--max-steps", type=int, default=100000)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from common import (FIXED_DT, H, W, FX, FY, PARITY_MODEL,
                        PARITY_SAMPLE, TAIL_STEPS, Evaluator,
                        make_synth_dataset, run_summary)
    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import config_from_dict

    base = json.load(open("/root/repo/experiments/round1_final/"
                          f"{args.preset}_0/config.json"))
    base["model"].pop("grad_mode", None)
    base["loss"]["bounds_method"] = args.bounds_method
    # --- the full quality stack (diff vs run_ours.py) ---
    base["model"]["do_active"] = 1
    base["model"]["kf_pixel_ratio"] = 0.8
    base["model"].update(PARITY_MODEL)         # same small workload
    base["sample"].update(PARITY_SAMPLE)
    base["dataset"]["camera"] = {"w": W, "h": H, "fx": FX, "fy": FY,
                                 "cx": (W - 1) / 2.0, "cy": (H - 1) / 2.0}
    base["dataset"]["seq_dir"] = f"synthetic/{args.preset}"
    cfg = config_from_dict(base)
    # tail extras stay at shipped defaults (tail_lr_min=0.05,
    # tail_loss_window=True) — only eval-inside-the-trainer stays off
    cfg = cfg.replace(do_eval=False)

    tr = Trainer(cfg, dataset=make_synth_dataset(args.preset),
                 seed=args.seed)
    tr._per_step_device_s = FIXED_DT
    tr._bill_exact = True

    ev = Evaluator(args.preset)
    curve = []

    def eval_hook(trainer):
        entry = ev.score(trainer.sdf_fn, trainer.tot_step_time)
        entry["step"] = trainer.steps_taken
        curve.append(entry)
        print(f"step {entry['step']} t_sim={entry['t']:.2f} "
              f"vis={entry['vis_mae']*100:.2f}cm "
              f"vol={entry['vol_mae']*100:.2f}cm", flush=True)
        return entry

    t0 = time.perf_counter()
    res = train_loop(tr, max_steps=args.max_steps,
                     extra_opt_steps=TAIL_STEPS,
                     eval_hook=eval_hook, log_fn=None)

    out = {"system": "ours_full", "preset": args.preset, "seed": args.seed,
           "bounds_method": args.bounds_method, "steps": res.steps,
           "kf_ids": res.kf_indices,
           "wall_s": time.perf_counter() - t0,
           "curve": curve, **run_summary(curve)}
    os.makedirs(os.path.dirname(os.path.abspath(args.out_json)),
                exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=2)
    print("final:", run_summary(curve))


if __name__ == "__main__":
    main()
