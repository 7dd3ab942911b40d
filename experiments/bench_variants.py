#!/usr/bin/env python
"""Throughput of engine variants at the reference per-step workload.

Usage: python experiments/bench_variants.py [variant ...]
Variants: ray | pc_xla | pc_kernel   (default: all three)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

VARIANTS = {
    "ray": dict(bounds_method="ray"),
    "pc_xla": dict(bounds_method="pc", pc_in_kernel=False),
    "pc_kernel": dict(bounds_method="pc", pc_in_kernel=True),
}


def main():
    import numpy as np

    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import Config

    names = sys.argv[1:] or list(VARIANTS)
    scene = SyntheticScene(extents=(6.0, 3.0, 4.5))
    ds = SyntheticDataset(scene, n_frames=400, H=680, W=1200,
                          orbit_radius=1.6)
    for name in names:
        cfg = Config().replace(dataset_format="synthetic",
                               **VARIANTS[name])
        tr = Trainer(cfg, dataset=ds, seed=1)
        for fid in np.linspace(0, 360, 8, dtype=int):
            tr.last_is_keyframe = True
            tr.add_frame(tr.get_data([int(fid)])[0])
        bundle = 600
        tr._ensure_compiled(bundle)
        tr._timed_throwaway_bundle(bundle)  # warm
        walls = [tr._timed_throwaway_bundle(bundle) for _ in range(4)]
        ms = (float(np.median(walls)) - tr._sync_overhead_s) / bundle * 1e3
        print(f"{name:10s} {ms:.3f} ms/step  {1000.0 / ms:7.1f} steps/s",
              flush=True)


if __name__ == "__main__":
    main()
