"""Shared harness for the step-budget quality A/B: our engine vs the
PyTorch reference, both driven CLOCK-FREE on the same synthetic scenes
(VERDICT r2 "what's missing" item 1b).

Design:
  * The synthetic scene is EXPORTED to disk in the Replica sequence
    format (depth%06d.png uint16, frame%06d.jpg, traj.txt) so the
    reference's own ReplicaDataset + image_transforms read it unmodified.
  * Both systems bill a FIXED per-step sim-time DT = 1/300 s (10
    iters/frame at 30 fps — the workload the reference was designed
    around), so both see the identical frame schedule and step budget
    regardless of host speed. Keyframe decisions remain each system's
    own (they depend on the learned field).
  * Evaluation is EXTERNAL and identical for both: a seeded numpy
    sampler draws visible-region points along rays of the frames seen so
    far + a fixed uniform volume set; MAE against the scene's analytic
    SDF. No system evaluates itself.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

FIXED_DT = 1.0 / 300.0       # sim seconds billed per optimisation step
FPS = 30.0
DEPTH_SCALE = 5000.0         # 0.2 mm quantisation in the exported pngs

# ---- parity-small protocol ----
# This host has ONE cpu core and the reference torch step costs
# ~1.4 s per 1k sample points here (measured: 7.4 s/step at 5.4k pts),
# so the production workload (27k pts/step, 400 frames => ~30 s/step,
# ~20 h/run) is infeasible. Both systems therefore run an identically
# REDUCED protocol — same model, same math, same fixed step budget —
# sized for ~45 min per reference run: the comparison is about equal-
# budget training dynamics, which scale down together.
H, W = 120, 160
FX = FY = 80.0               # same 90-deg hfov as the campaign scenes
MAX_DEPTH = 12.0
N_FRAMES = 120               # full orbit coverage (angle ~ i/n_frames)
PARITY_SAMPLE = {"n_rays": 30, "n_rays_is_kf": 120,
                 "n_strat_samples": 6, "n_surf_samples": 4}
PARITY_MODEL = {"window_size": 4, "iters_per_kf": 40}
TAIL_STEPS = 300


def make_synth_dataset(preset: str):
    from isdf_tpu.data.synthetic import SyntheticDataset, make_scene
    hfov = float(2 * np.degrees(np.arctan(W / (2 * FX))))
    return SyntheticDataset(make_scene(preset), n_frames=N_FRAMES, H=H, W=W,
                            hfov_deg=hfov, max_depth=MAX_DEPTH)


def export_replica_format(preset: str, out_dir: str) -> str:
    """Write the synthetic sequence to disk in the format the reference's
    ReplicaDataset reads (isdf/datasets/dataset.py:20-71): depth%06d.png
    (uint16, metres * DEPTH_SCALE), frame%06d.jpg, traj.txt (N x 16).
    Returns the sequence directory."""
    import cv2
    seq_dir = os.path.join(out_dir, preset)
    res_dir = os.path.join(seq_dir, "results")
    if os.path.exists(os.path.join(seq_dir, "traj.txt")):
        return seq_dir
    os.makedirs(res_dir, exist_ok=True)
    ds = make_synth_dataset(preset)
    Ts = []
    for i in range(len(ds)):
        s = ds[i]
        d16 = np.clip(s["depth"] * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(res_dir, f"depth{i:06}.png"), d16)
        cv2.imwrite(os.path.join(res_dir, f"frame{i:06}.jpg"), s["image"])
        Ts.append(s["T"].reshape(-1))
        ds._cache.clear()
    np.savetxt(os.path.join(seq_dir, "traj.txt"), np.stack(Ts))
    T_b, ext = ds.scene_bounds()
    meta = {"preset": preset, "H": H, "W": W, "fx": FX, "fy": FY,
            "cx": (W - 1) / 2.0, "cy": (H - 1) / 2.0,
            "depth_scale": DEPTH_SCALE, "fps": FPS,
            "bounds_T": T_b.tolist(), "extents": ext.tolist()}
    with open(os.path.join(seq_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return seq_dir


class Evaluator:
    """Identical external scorer for both systems."""

    def __init__(self, preset: str, seed: int = 0):
        from isdf_tpu.data.synthetic import make_scene
        self.scene = make_scene(preset)
        self.ds = make_synth_dataset(preset)
        rng = np.random.default_rng(seed)
        # fixed volume set: uniform in the interior box (walls inset)
        c, e = self.scene.center, self.scene.extents
        lo, hi = c - e / 2 * 0.95, c + e / 2 * 0.95
        self.vol_pts = rng.uniform(lo, hi, (20000, 3)).astype(np.float32)
        self.vol_gt = self.scene.sdf_np(self.vol_pts).reshape(-1)
        self._dirs = np.asarray(self.ds._dirs_C)

    def visible_pts(self, t_sim: float, n: int = 20000, seed: int = 0):
        """Visible-region points: rays of frames seen up to t_sim, one
        stratified + one near-surface sample per ray (the reference
        protocol's sampling shape, numpy-reimplemented so neither system
        owns the scorer)."""
        rng = np.random.default_rng(seed + int(t_sim * 1000))
        max_ix = max(min(int(np.floor(t_sim * FPS)), len(self.ds)), 1)
        frames = np.arange(0, max_ix, 5)
        rays_per = max(n // (2 * len(frames)), 1)
        pts = []
        for fi in frames:
            s = self.ds[int(fi)]
            depth, T = s["depth"], s["T"]
            ih = rng.integers(0, H, rays_per)
            iw = rng.integers(0, W, rays_per)
            d = depth[ih, iw]
            ok = d > 0
            if not ok.any():
                continue
            ih, iw, d = ih[ok], iw[ok], d[ok]
            dirs_C = self._dirs[ih, iw]
            dirs_W = dirs_C @ T[:3, :3].T
            o = T[:3, 3]
            z_strat = rng.uniform(0.07, d + 0.1)
            z_surf = np.clip(d + rng.normal(0, 0.1, d.shape), 0.07, None)
            for z in (z_strat, z_surf):
                pts.append(o + dirs_W * z[:, None])
        return np.concatenate(pts).astype(np.float32)

    def score(self, sdf_fn, t_sim: float):
        """sdf_fn: np [N,3] -> np [N]. Returns dict of MAEs (metres)."""
        vis = self.visible_pts(t_sim)
        vis_gt = self.scene.sdf_np(vis).reshape(-1)
        vis_pred = np.asarray(sdf_fn(vis)).reshape(-1)
        vol_pred = np.asarray(sdf_fn(self.vol_pts)).reshape(-1)
        return {
            "t": float(t_sim),
            "vis_mae": float(np.abs(vis_pred - vis_gt).mean()),
            "vol_mae": float(np.abs(vol_pred - self.vol_gt).mean()),
            "n_vis": int(len(vis)),
        }


def run_summary(curve):
    last = curve[-1]
    return {"final_vis_cm": last["vis_mae"] * 100,
            "final_vol_cm": last["vol_mae"] * 100,
            "n_evals": len(curve)}
