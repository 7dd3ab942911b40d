"""Debug oracles — the reference's commented-out checking harnesses made
to work.

check_gt_sdf: per-ray profiles of the bound TARGETS (ray / normal /
batch-distance) against the true signed distance along sampled rays
(reference Trainer.check_gt_sdf, isdf/modules/trainer.py:870-949 —
shipped commented out at its call site trainer.py:859-861). The plot is
the fastest way to see which supervision method is lying where: the ray
bound over-estimates in free space at grazing angles, the batch
distance hugs the true SDF, the normal bound is only valid near the
surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def check_gt_sdf(trainer, frame_ix: int = 0,
                 ray_ixs: Sequence[int] = (9, 19, 23),
                 n_rays: int = 100, seed: int = 0,
                 out_file: Optional[str] = None):
    """Render the bound-target vs true-SDF profiles for a few rays of
    one buffered keyframe. Requires trainer.gt_sdf_fn (synthetic scenes
    and gt_sdf_dir runs have it). Returns the figure path (out_file) or
    the per-ray dict when out_file is None."""
    from isdf_tpu.ops import bounds as B
    from isdf_tpu.ops import sampling as S

    if trainer.gt_sdf_fn is None:
        raise ValueError("check_gt_sdf needs a GT SDF "
                         "(synthetic scene or gt_sdf_dir)")
    cfg = trainer.cfg
    depth_img = np.asarray(trainer.buffer.depth[frame_ix])
    T_WC = jnp.asarray(trainer.buffer.T_WC[frame_ix])

    key = jax.random.PRNGKey(seed)
    k_pix, k_ray = jax.random.split(key)
    ib, ih, iw = S.sample_pixels(k_pix, n_rays, 1,
                                 trainer.H, trainer.W)
    depth = jnp.asarray(depth_img)[ih, iw]
    dirs_C = trainer.dirs_C[ih, iw]
    pc, z_vals, origins, dirs_W = S.sample_along_rays(
        k_ray, jnp.broadcast_to(T_WC, (n_rays, 4, 4)), dirs_C, depth,
        cfg.min_depth, cfg.dist_behind_surf, cfg.n_strat_samples,
        cfg.n_surf_samples)

    # sort by z like the reference (trainer.py:873-881)
    order = jnp.argsort(z_vals, axis=1)
    z_sorted = jnp.take_along_axis(z_vals, order, axis=1)
    pc_sorted = jnp.take_along_axis(pc, order[..., None], axis=1)

    valid = depth > 0
    t_ray = B.bounds_ray(depth, z_sorted, dirs_C, dirs_W).bounds
    t_pc = B.bounds_pc(pc_sorted, z_sorted, depth, valid).bounds
    t_normal = None
    if trainer.buffer.normals is not None and cfg.do_normal:
        normals = jnp.asarray(trainer.buffer.normals[frame_ix])[ih, iw]
        t_normal = B.bounds_normal(
            depth, z_sorted, dirs_C, normals, cfg.trunc_distance,
            dirs_W).bounds

    # euclidean distance along the ray (z * |dir|), reference :883-884
    z_euc = np.asarray(z_sorted) * np.linalg.norm(
        np.asarray(dirs_C), axis=-1, keepdims=True)
    gt = trainer.gt_sdf_fn(
        np.asarray(pc_sorted).reshape(-1, 3)).reshape(z_euc.shape)

    rows = {}
    for i in ray_ixs:
        rows[int(i)] = {
            "z": z_euc[i], "gt_sdf": gt[i],
            "ray": np.asarray(t_ray)[i],
            "pc": np.asarray(t_pc)[i],
            "normal": (np.asarray(t_normal)[i]
                       if t_normal is not None else None),
        }
    if out_file is None:
        return rows

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(len(rows), 1,
                             figsize=(11, 3.3 * len(rows)),
                             squeeze=False)
    for j, (i, r) in enumerate(rows.items()):
        ax = axes[j][0]
        ax.hlines(0, r["z"][0], r["z"][-1], color="gray", linestyle="--")
        ax.plot(r["z"], r["gt_sdf"], label="True signed distance",
                color="C1", lw=2.5)
        ax.plot(r["z"], r["ray"], label="Ray", color="C3", lw=2.5)
        if r["normal"] is not None:
            ax.plot(r["z"], r["normal"], label="Normal", color="C2",
                    lw=2.5)
        ax.plot(r["z"], r["pc"], label="Batch distance", color="C0",
                lw=2.5)
        ax.set_ylabel("signed distance [m]")
        if j == 0:
            ax.legend(fontsize=9)
    axes[-1][0].set_xlabel("distance along ray, d [m]")
    fig.tight_layout()
    fig.savefig(out_file, dpi=120)
    plt.close(fig)
    return out_file
