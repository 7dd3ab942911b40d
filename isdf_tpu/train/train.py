#!/usr/bin/env python
"""Training CLI (reference: isdf/train/train.py:282-358).

    python -m isdf_tpu.train.train --config cfg.json [-ni] [-hd] \
        [--save_path DIR] [--max_steps N] [--seed S]

Headless by default on TPU; accepts the reference's JSON config schema
unchanged. ``-ni`` disables incremental (SLAM) mode like the reference.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime


def main(argv=None):
    parser = argparse.ArgumentParser(description="isdf_tpu trainer")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("-ni", "--no_incremental", action="store_false",
                        dest="incremental",
                        help="disable incremental SLAM mode")
    parser.add_argument("-hd", "--headless", action="store_true",
                        help="accepted for reference-CLI parity "
                             "(runs are headless on TPU regardless)")
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--save", action="store_true",
                        help="save to results/isdf_tpu/<timestamp>")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_time_s", type=float, default=None,
                        help="stop after this much simulated time")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--load_checkpoint", type=str, default=None,
                        help=".npz full-state checkpoint or a reference "
                             "torch .pth (weights only)")
    parser.add_argument("--grid_dim", type=int, default=200)
    parser.add_argument("--per_step", action="store_true",
                        help="reference-exact per-step loop (no bundling)")
    parser.add_argument("--trace", type=str, default=None,
                        help="write a jax.profiler trace to this directory")
    parser.add_argument("--sim_dt", type=float, default=None,
                        help="bill the simulated clock a FIXED dt seconds "
                             "per optimisation step instead of measured "
                             "device time — deterministic replay clocking "
                             "for CI and cross-host quality comparisons "
                             "(e.g. 1/300 reproduces the reference's "
                             "real-time budget, SURVEY.md section 6)")
    parser.add_argument("--set", action="append", dest="overrides",
                        metavar="SECTION.KEY=VALUE",
                        help="override a config entry (repeatable), e.g. "
                             "--set dataset.live_transport=ros "
                             "--set sample.n_rays=400")
    args = parser.parse_args(argv)

    from isdf_tpu.utils.jax_setup import honor_platform_env
    honor_platform_env()  # axon ignores JAX_PLATFORMS; the config knob works

    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import load_config

    cfg = load_config(args.config, overrides=args.overrides)

    save_path = args.save_path
    if args.save and save_path is None:
        stamp = datetime.now().strftime("%m-%d-%y_%H-%M-%S")
        save_path = os.path.join("results", "isdf_tpu", stamp)
    if save_path:
        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, "config.json"), "w") as f:
            with open(args.config) as src:
                json.dump(json.load(src), f, indent=4)

    trainer = Trainer(cfg, incremental=args.incremental,
                      grid_dim=args.grid_dim, seed=args.seed)
    if args.sim_dt is not None:
        trainer._per_step_device_s = args.sim_dt
        trainer._bill_exact = True
    if args.load_checkpoint:
        trainer.load_checkpoint(args.load_checkpoint)
    import contextlib

    from isdf_tpu.utils.profiling import device_trace
    ctx = (device_trace(args.trace) if args.trace
           else contextlib.nullcontext())
    with ctx:
        res = train_loop(
            trainer,
            max_steps=args.max_steps,
            max_time_s=args.max_time_s,
            bundle=not args.per_step,
            save_path=save_path,
            log_fn=lambda m: print(m, flush=True),
        )
    print(f"done: {res.steps} steps in {res.wall_time:.1f}s wall "
          f"({res.tot_step_time:.1f}s simulated), "
          f"{len(res.kf_indices) + 1} keyframes")
    return res


if __name__ == "__main__":
    main()
