#!/usr/bin/env python
"""Measure multi-scene lockstep throughput on one TPU chip.

Question: how many live scenes can ONE v5e chip map in real time?
The reference architecture is one GPU per scene (isdf/train/train.py:283);
here K scenes run inside one jitted program (parallel/multi_scene.py).

Protocol (bench.py methodology — long bundles, value-fetch sync,
min-of-N walls): for K in {1, 2, 4}, build K trainers on distinct
synthetic scenes at the FULL reference per-step workload (5 KFs x 200
rays x 27 samples, 680x1200 camera, pc bounds in-kernel) at the
DEFAULT arena capacity (160 keyframes/scene — fits K=4 since the
round-5 lean joint program keeps the big arena planes un-stacked and
un-donated), populate 8 keyframes each, run 600-step joint bundles
through run_steps and report:

  per_scene_steps_per_sec = 1 / joint_step_wall        (each scene
      advances one step per joint step)
  aggregate_steps_per_sec = K * per_scene_steps_per_sec
  realtime_per_scene      = per_scene_steps_per_sec / 300

Each K runs in its own subprocess so one K's allocator state
(fragmentation, cached executables) cannot bleed into the next.
Writes experiments/multi_scene/results.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BUNDLE = 600


def run_one(K: int, kf_capacity: int = 160):
    import jax
    import numpy as np

    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.parallel.multi_scene import MultiSceneStepper
    from isdf_tpu.utils.config import Config

    # kf_buffer_size=160 — the single-scene default. The arena is
    # ~13 MB/frame at 680x1200 (depth + normals), so K=4 scenes at
    # capacity 160 hold ~8.4 GB; before round 5 the joint program
    # stacked+donated the full per-scene state (2x transient -> measured
    # RESOURCE_EXHAUSTED, the round-4 bench had to shrink to 64/scene).
    # The lean joint (parallel/multi_scene.py: big planes as read-only
    # switch operands, small state donated) keeps residency at ~1x and
    # fits the default arena.
    cfg = Config().replace(dataset_format="synthetic", bounds_method="pc",
                           kf_buffer_size=kf_capacity)
    extents = [(6.0, 3.0, 4.5), (4.0, 2.6, 6.0), (5.0, 3.2, 5.0),
               (7.0, 2.8, 3.5)]

    def make_trainer(i, seed):
        scene = SyntheticScene(extents=extents[i % len(extents)])
        ds = SyntheticDataset(scene, n_frames=64, H=680, W=1200,
                              orbit_radius=1.4 + 0.1 * i)
        tr = Trainer(cfg, dataset=ds, seed=seed)
        for fid in np.linspace(0, 60, 8, dtype=int):
            tr.last_is_keyframe = True
            tr.add_frame(tr.get_data([int(fid)])[0])
        return tr

    trainers = [make_trainer(i, seed=1 + i) for i in range(K)]
    stepper = MultiSceneStepper(trainers)
    # skip the copy-based device-time calibration: timing here is
    # external, and the copies would double the K-scene footprint
    stepper._per_step_device_s = 0.0
    t0 = time.perf_counter()
    stepper._ensure_compiled(BUNDLE)
    compile_s = time.perf_counter() - t0
    stepper.run_steps(BUNDLE)  # warm (donated states, no copies)
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        stepper.run_steps(BUNDLE)  # internal scalar fetch = the sync
        walls.append(time.perf_counter() - t0)
    sync = trainers[0]._sync_overhead_s
    joint_step_ms = (max(float(np.min(walls)) - sync, 1e-4)
                     / BUNDLE * 1e3)
    per_scene = 1000.0 / joint_step_ms
    try:  # measured HBM footprint (VERDICT r4 item 2) — not all
        ms = jax.local_devices()[0].memory_stats()  # backends expose it
        hbm = {"bytes_in_use_gb": round(ms["bytes_in_use"] / 2**30, 2),
               "peak_bytes_in_use_gb": round(
                   ms.get("peak_bytes_in_use", 0) / 2**30, 2)}
    except Exception as e:  # pragma: no cover - axon tunnel variance
        hbm = {"unavailable": str(e)[:120]}
    rec = {
        "hbm": hbm,
        "joint_step_ms": round(joint_step_ms, 3),
        "per_scene_steps_per_sec": round(per_scene, 1),
        "aggregate_steps_per_sec": round(K * per_scene, 1),
        "realtime_per_scene": round(per_scene / 300.0, 2),
        "compile_s": round(compile_s, 1),
        "walls_s": [round(w, 3) for w in walls],
        "device": str(jax.devices()[0]),
    }
    print("RESULT " + json.dumps(rec), flush=True)


def main():
    out = {"bundle": BUNDLE,
           "workload": "5x200 rays x 27 samples, 680x1200, pc bounds, "
                       "kf_buffer_size=160/scene (the single-scene "
                       "default; fits K=4 since the round-5 lean joint)",
           "runs": {}}
    for K in (1, 2, 4):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(K)],
            capture_output=True, text=True, timeout=2400)
        lines = [ln for ln in p.stdout.splitlines()
                 if ln.startswith("RESULT ")]
        if not lines:
            out["runs"][K] = {"error": p.stderr[-2000:]}
            print(f"K={K}: FAILED\n{p.stderr[-2000:]}", flush=True)
            continue
        rec = json.loads(lines[-1][len("RESULT "):])
        out["runs"][K] = rec
        out["device"] = rec.pop("device")
        print(f"K={K}: joint {rec['joint_step_ms']:.3f} ms/step -> "
              f"{rec['per_scene_steps_per_sec']:.0f} steps/s per scene "
              f"({rec['aggregate_steps_per_sec']:.0f} aggregate, "
              f"{rec['realtime_per_scene']:.2f}x real-time each)",
              flush=True)

    os.makedirs("/root/repo/experiments/multi_scene", exist_ok=True)
    with open("/root/repo/experiments/multi_scene/results.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["runs"]))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(int(sys.argv[1]),
                int(sys.argv[2]) if len(sys.argv) > 2 else 160)
    else:
        main()
