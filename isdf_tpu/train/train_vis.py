#!/usr/bin/env python
"""Training with visual monitoring (reference: isdf/train/train_vis.py).

The reference drives an Open3D GUI; Open3D is unavailable here, so this
entry point runs the same training loop while periodically emitting the
GUI's content as images into <save_path>/monitor/: keyframe strip,
latest-frame render panel (rgb/depth vs rendered normals/depth), SDF
slices and mesh turntables.

    python -m isdf_tpu.train.train_vis --config cfg.json \
        --save_path out/ [--monitor_every_s 2.0]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--save_path", "--out", dest="save_path", type=str,
                    default="results/monitor_run")
    ap.add_argument("--monitor_every_s", type=float, default=2.0)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--max_time_s", type=float, default=None)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="also serve the interactive viewer "
                         "(vis/server.py) on this port; the SDF "
                         "snapshot refreshes each monitor cycle")
    ap.add_argument("--serve-queries", type=int, default=None,
                    metavar="PORT",
                    help="also serve the planner query API (serve.py: "
                         "POST /sdf /grad /query /collision) on this "
                         "port; the served map snapshot refreshes each "
                         "monitor cycle")
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="SECTION.KEY=VALUE",
                    help="override a config entry (repeatable), e.g. "
                         "--set dataset.live_transport=ros")
    args = ap.parse_args(argv)

    from isdf_tpu.utils.jax_setup import honor_platform_env
    honor_platform_env()  # axon ignores JAX_PLATFORMS; the config knob works

    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import load_config
    from isdf_tpu.vis import viewer as V
    from isdf_tpu.vis import slices as SL

    trainer = Trainer(load_config(args.config, overrides=args.overrides),
                      seed=args.seed)
    mon_dir = os.path.join(args.save_path, "monitor")
    os.makedirs(mon_dir, exist_ok=True)

    web = None
    if args.serve is not None:
        from isdf_tpu.vis.server import SDFWebViewer, ViewerSource
        web = SDFWebViewer(
            ViewerSource.from_trainer(trainer, loop_attached=True),
            port=args.serve).start()
        print(f"interactive viewer: http://127.0.0.1:{web.port}",
              flush=True)

    qsrv = None
    if args.serve_queries is not None:
        from isdf_tpu.serve import SDFQueryEngine, SDFQueryServer
        qsrv = SDFQueryServer(SDFQueryEngine.from_trainer(trainer),
                              port=args.serve_queries).start()
        print(f"query API: http://127.0.0.1:{qsrv.port}", flush=True)

    state = {"last": -1e9, "i": 0}

    def hook(tr):
        if tr.tot_step_time - state["last"] >= args.monitor_every_s:
            import time as _time
            t0 = _time.perf_counter()
            state["last"] = tr.tot_step_time
            tag = f"{state['i']:04d}_"
            state["i"] += 1
            # content toggles (reference isdf_window.py mesh/slices
            # checkboxes): skipping gates the recompute work itself
            ctl = (web.source.get_controls() if web is not None
                   else {"do_mesh": True, "do_slices": True})
            if ctl["do_mesh"]:
                V.monitor(tr, mon_dir, tag=tag)
            if ctl["do_slices"]:
                SL.write_slices(tr, mon_dir, prefix=tag, n_slices=2,
                                include_gt=tr.gt_sdf_fn is not None)
            if web is not None:
                # snapshot from the loop thread (so browser requests do
                # not race the device), and only when someone is actually
                # watching — an idle viewer costs the run nothing
                web.source.refresh_if_watched()
            if qsrv is not None:
                # planners always get a fresh map: the snapshot swap is
                # one small device copy, cheap at monitor cadence
                qsrv.engine.refresh_from_trainer(tr)
            # the reference GUI's 20-s train-vs-vis compute balance
            # (isdf_window.py:694-708)
            tr.step_timer.add("vis", _time.perf_counter() - t0)
        return {}

    import contextlib

    from isdf_tpu.utils.profiling import device_trace
    ctx = device_trace(args.trace) if args.trace else contextlib.nullcontext()
    control_hook = None
    if web is not None:
        def control_hook():
            c = web.source.get_controls()
            if c.get("paused"):
                # paused: the device is idle, so the loop thread can
                # service viewer refreshes immediately
                web.source.refresh_if_watched()
            return c

    with ctx:
        res = train_loop(trainer, max_steps=args.max_steps,
                         max_time_s=args.max_time_s,
                         save_path=args.save_path, eval_hook=hook,
                         control_hook=control_hook,
                         log_fn=lambda m: print(m, flush=True))
    bal = trainer.perf_summary()
    print("compute balance (20s window): " + ", ".join(
        f"{k}={v:.2f}" for k, v in bal.items()))
    V.mesh_turntable(trainer, os.path.join(mon_dir, "final_mesh"))
    print(f"done: {res.steps} steps, monitor frames in {mon_dir}")
    return res


if __name__ == "__main__":
    main()
