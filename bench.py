#!/usr/bin/env python
"""Benchmark: optimisation steps/sec of the fused train step on one chip.

Workload = the reference per-step budget (BASELINE.md): 5 keyframes x 200
rays x 27 depth samples through the 255->4x256 Softplus MLP with eikonal
double-backward + gradient-cosine losses, AdamW, loss-weighted keyframe
window selection, on a full 1200x680 camera — i.e. the complete
trainer.step() of the reference (isdf/modules/trainer.py:951-1016), not
just the MLP.

Baseline anchor: the reference needs ~300 steps/s to sustain real time at
frac_time_perception=1.0 (10 iters/frame, 60/kf at 30 fps; BASELINE.md);
vs_baseline = steps_per_sec / 300.

Also reports SDF MAE after 3000 steps against the synthetic scene's
analytic ground truth (quality sanity at speed).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.utils.config import Config

    # replicaCAD defaults + batch-distance (pc) bounds — the supervision
    # used by the reference's published exp0 results and by the quality
    # campaign (experiments/round2d: mean 2.87 cm); computed in-kernel
    cfg = Config().replace(dataset_format="synthetic", bounds_method="pc")
    scene = SyntheticScene(extents=(6.0, 3.0, 4.5))
    ds = SyntheticDataset(scene, n_frames=400, H=680, W=1200,
                          orbit_radius=1.6)
    trainer = Trainer(cfg, dataset=ds, seed=1)

    # populate the keyframe arena like a running session (8 keyframes)
    for fid in np.linspace(0, 360, 8, dtype=int):
        trainer.last_is_keyframe = True
        trainer.add_frame(trainer.get_data([int(fid)])[0])

    # ---- throughput: long bundles so the per-call host RTT is noise ----
    # measured directly (wall of the 600-step bundle, fetch-synced, minus
    # the calibrated tiny-fetch RTT) rather than through the sim clock's
    # differential device-time estimate
    bundle = 600
    trainer._ensure_compiled(bundle)
    trainer._timed_throwaway_bundle(bundle)  # warm (first-exec upload)
    walls = [trainer._timed_throwaway_bundle(bundle) for _ in range(6)]
    # min, not median: tunnel congestion only ever ADDS wall time, so the
    # best repetition is the least-interfered estimate of device cost
    step_ms = (max(float(np.min(walls)) - trainer._sync_overhead_s,
                   1e-4)
               / bundle * 1e3)
    steps_per_sec = 1000.0 / step_ms
    trainer.run_steps(bundle)  # the quality eval below trains on
    trainer.run_steps(bundle)
    trainer.run_steps(bundle)
    trainer.run_steps(bundle)

    rays = cfg.window_size * cfg.n_rays
    pts_per_sec = steps_per_sec * rays * cfg.n_samples_per_ray

    # ---- workload scaling: 2x rays/step (the scalable headline) ----
    # the fixed 27k-point step is FLOP-bound near its ceiling (docs/
    # PERF.md); throughput scales with workload, so points/sec at 2x
    # rays is the honest capacity metric. ns/point should stay ~flat.
    def _scaled(mult):
        tr = Trainer(cfg.replace(n_rays=mult * cfg.n_rays), dataset=ds,
                     seed=1)
        for fid in np.linspace(0, 360, 8, dtype=int):
            tr.last_is_keyframe = True
            tr.add_frame(tr.get_data([int(fid)])[0])
        tr._ensure_compiled(bundle)
        tr._timed_throwaway_bundle(bundle)
        walls = [tr._timed_throwaway_bundle(bundle) for _ in range(6)]
        ms = (max(float(np.min(walls)) - tr._sync_overhead_s, 1e-4)
              / bundle * 1e3)
        return ms, (1000.0 / ms) * mult * rays * cfg.n_samples_per_ray

    step_ms_2x, pts_per_sec_2x = _scaled(2)
    step_ms_4x, pts_per_sec_4x = _scaled(4)

    # ---- quality sanity: visible-region MAE vs analytic GT ----
    mae = eval_sdf(trainer, samples=20000, visible_region=True,
                   seed=0)["av_l1"]
    steps_run = int(trainer.steps_taken)

    # ---- multi-scene: MEASURED K=2 shared-chip rate (two robots, one
    # chip — parallel/multi_scene.py). Timed through the donated
    # run_steps path; arena 64/scene (full workload otherwise). Guarded:
    # a failure here must never cost the headline metric.
    ms2_joint_ms = None
    try:
        from isdf_tpu.parallel.multi_scene import MultiSceneStepper
        del trainer  # free the 160-frame arena before the 2-scene state
        cfg_ms = cfg.replace(kf_buffer_size=64)
        trs = []
        for i, ext in enumerate(((6.0, 3.0, 4.5), (4.0, 2.6, 6.0))):
            ds_i = SyntheticDataset(SyntheticScene(extents=ext),
                                    n_frames=64, H=680, W=1200,
                                    orbit_radius=1.5 + 0.1 * i)
            tr = Trainer(cfg_ms, dataset=ds_i, seed=1 + i)
            for fid in np.linspace(0, 60, 8, dtype=int):
                tr.last_is_keyframe = True
                tr.add_frame(tr.get_data([int(fid)])[0])
            trs.append(tr)
        stepper = MultiSceneStepper(trs)
        stepper._per_step_device_s = 0.0  # timing is external
        stepper._ensure_compiled(bundle)
        stepper.run_steps(bundle)  # warm
        walls2 = []
        for _ in range(4):
            t0 = time.perf_counter()
            stepper.run_steps(bundle)  # internal scalar fetch = sync
            walls2.append(time.perf_counter() - t0)
        ms2_joint_ms = (max(float(np.min(walls2))
                            - trs[0]._sync_overhead_s, 1e-4)
                        / bundle * 1e3)
        del trs, stepper
    except Exception:
        ms2_joint_ms = None

    out = {
        "metric": "opt_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 300.0, 2),
        "sampled_points_per_sec": round(pts_per_sec),
        "step_ms": round(step_ms, 3),
        "step_ms_2x_rays": round(step_ms_2x, 3),
        "sampled_points_per_sec_2x_rays": round(pts_per_sec_2x),
        "ns_per_point": round(1e6 * step_ms
                              / (rays * cfg.n_samples_per_ray), 2),
        "ns_per_point_2x_rays": round(1e6 * step_ms_2x
                                      / (2 * rays * cfg.n_samples_per_ray),
                                      2),
        "step_ms_4x_rays": round(step_ms_4x, 3),
        "sampled_points_per_sec_4x_rays": round(pts_per_sec_4x),
        "ns_per_point_4x_rays": round(1e6 * step_ms_4x
                                      / (4 * rays * cfg.n_samples_per_ray),
                                      2),
        # dp projection (correctness proven by the 8-device dryrun /
        # tests/test_parallel.py sharded==single; no multi-chip hardware
        # in this image): each chip runs the full per-chip kernel on its
        # ray shard, the only cross-chip traffic is one psum of the
        # ~5.3 MB packed grads + scalars per step — ≲0.06 ms over ICI
        # (~90 GB/s/link), amortised inside the 600-step bundle.
        "dp_projected_points_per_sec_8chip": round(
            8 * pts_per_sec_4x * step_ms_4x / (step_ms_4x + 0.06)),
        "sdf_mae_m_static_replay": round(float(mae), 4),
        "steps_run": steps_run,
        "mm_precision": cfg.mm_precision,
        "bounds_method": cfg.bounds_method,
        "device": str(jax.devices()[0]),
    }
    if ms2_joint_ms is not None:
        # measured joint 2-scene bundle: each scene advances one step
        # per joint step, so per-scene rate = 1/joint_step
        out["multi_scene_k2_joint_step_ms"] = round(ms2_joint_ms, 3)
        out["multi_scene_k2_per_scene_steps_per_sec"] = round(
            1000.0 / ms2_joint_ms, 1)
        out["multi_scene_k2_realtime_per_scene"] = round(
            1000.0 / ms2_joint_ms / 300.0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
