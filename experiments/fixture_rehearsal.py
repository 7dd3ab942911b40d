#!/usr/bin/env python
"""Benchmark dress rehearsal on the REAL TPU (VERDICT round-3 item 1):
production-config run of the real-data pipeline over a synthesized
ReplicaCAD-format fixture, end to end through the unmodified train CLI
into vox_res.json and the figure layer.

Everything matches the reference benchmark protocol except the pixels:
full 1200x680 camera, 30 fps real-time clock (no --sim_dt: the TPU is
fast enough to run the protocol at true real time), hidden 256 MLP,
pc (batch-distance) supervision — the variant behind the reference's
published exp0 numbers (BASELINE.md caveat), 200k-point fixed evals
against the masked eval_pts tree.

The fixture data stays in /tmp (PNG frames are bulky); the committed
artifacts are the run dir (config/vox_res/res) + the per-seq figure
under experiments/fixture_rehearsal/.

Usage: python experiments/fixture_rehearsal.py [fixture_root]
"""
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

ROOT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/fixture_rehearsal")
OUT = "/root/repo/experiments/fixture_rehearsal"


def main():
    from isdf_tpu.data.fixtures import write_replicaCAD_fixture
    from isdf_tpu.eval import figs
    from isdf_tpu.train.train import main as train_main

    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    os.makedirs(ROOT)
    print("synthesizing fixture ...", flush=True)
    cfg_path = write_replicaCAD_fixture(
        ROOT, preset="room_b", n_frames=240, H=680, W=1200,
        hfov_deg=90.0, fps=30.0, grid_dim=128, mesh_dim=96,
        eval_times=(2.0, 5.0, 8.0), eval_samples=200000,
        bounds_method="pc", depth_noise_std=0.005)

    run_dir = os.path.join(OUT, "room_b_nav_0")
    os.makedirs(run_dir, exist_ok=True)
    print("training (real-time clock, real TPU) ...", flush=True)
    train_main(["--config", cfg_path, "--save_path", run_dir,
                "--max_steps", "20000", "--seed", "1"])

    figs.plot_per_seq(run_dir, os.path.join(OUT, "per_seq.png"))
    import json
    vox = json.load(open(os.path.join(run_dir, "vox_res.json")))
    for k in sorted(vox, key=float):
        e = vox[k]
        print(f"t={k}: vis {100 * e['rays']['vis']['av_l1']:.2f} cm, "
              f"vox {100 * e['rays']['vox']['av_l1']:.2f} cm, "
              f"surf {100 * e['visible_surf']['vis']['av_l1']:.2f} cm, "
              f"vol {100 * e['vol']['av_l1']:.2f} cm")


if __name__ == "__main__":
    main()
