"""Oracle debugging harness: bound targets vs the true SDF along rays.

The reference ships this only as the commented-out ``Trainer.check_gt_sdf``
(isdf/modules/trainer.py:870-949, call site commented at :859-861): a
matplotlib panel plotting the three self-supervised bound targets against
the GT SDF along a few sampled rays — the visual argument behind the
paper's bound construction. Here it is a working, importable, tested
utility, and it additionally overlays the network's predicted SDF (the
reference plot shows only the targets).

Use it when supervision looks wrong: if the "Batch distance" curve hugs
the GT while "Ray" overshoots in free space, the bounds are healthy and
the problem is elsewhere; if pc diverges from GT near the surface, the
surface sample set is too sparse (tpu.pc_surf_budget).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from isdf_tpu.ops import bounds as B
from isdf_tpu.ops import sampling as S


def ray_oracle(trainer, slot: int = 0, n_rays: int = 3,
               seed: int = 0) -> List[Dict[str, np.ndarray]]:
    """Sample ``n_rays`` valid rays from keyframe ``slot`` and return, per
    ray, the sample depths plus every supervision signal along them.

    Returns a list of dicts with keys ``z`` (euclidean distance along the
    ray, sorted ascending), ``ray`` / ``normal`` / ``pc`` (the three bound
    targets, reference loss.py:13-89), ``pred`` (network SDF) and ``gt``
    (true SDF; NaN-filled when the trainer has no GT oracle).
    """
    buf = trainer.buffer
    count = int(buf.count)
    if count == 0:
        raise ValueError("empty keyframe buffer — ingest a frame first")
    slot = slot % count
    cfg = trainer.cfg

    depth = buf.depth[slot:slot + 1]
    T_WC = buf.T_WC[slot:slot + 1]
    normals = (buf.normals[slot:slot + 1]
               if buf.normals is not None else None)

    # oversample so n_rays valid (non-zero-depth) rays survive the mask
    draw = max(4 * n_rays, 64)
    rs = S.sample_rays_from_frames(
        jax.random.PRNGKey(seed), depth, T_WC, trainer.dirs_C,
        normals, np.ones((1,), bool), draw,
        cfg.min_depth, cfg.dist_behind_surf,
        cfg.n_strat_samples, cfg.n_surf_samples)

    methods = {
        "ray": ("ray", True),
        "normal": ("normal", normals is not None),
        "pc": ("pc", True),
    }
    curves = {}
    for name, (method, ok) in methods.items():
        if not ok:
            continue
        curves[name] = np.asarray(B.compute_bounds(
            method, rs.dirs_C, rs.depth, rs.dirs_W, rs.z_vals, rs.pc,
            cfg.trunc_distance, rs.normals, rs.valid,
            do_grad=False).bounds)

    R, Ssz = rs.z_vals.shape
    pred = trainer.sdf_fn(
        np.asarray(rs.pc, np.float32).reshape(-1, 3)).reshape(R, Ssz)
    if getattr(trainer, "gt_sdf_fn", None) is not None:
        gt = np.asarray(trainer.gt_sdf_fn(
            np.asarray(rs.pc).reshape(-1, 3))).reshape(R, Ssz)
    else:
        gt = np.full((R, Ssz), np.nan, np.float32)

    z2e = np.linalg.norm(np.asarray(rs.dirs_C), axis=-1)
    z_euc = np.asarray(rs.z_vals) * z2e[:, None]

    out = []
    for i in np.flatnonzero(np.asarray(rs.valid))[:n_rays]:
        order = np.argsort(z_euc[i])
        ray = {"z": z_euc[i][order], "pred": pred[i][order],
               "gt": gt[i][order]}
        for name, c in curves.items():
            ray[name] = c[i][order]
        out.append(ray)
    return out


def vis_embedding(out_file: str, scale: float = 1.0,
                  min_deg: int = 0, max_deg: int = 5,
                  B: Optional[np.ndarray] = None,
                  x_max: float = 5.0, n: int = 640) -> str:
    """Frequency-band heatmap of the positional encoding along a 1-D
    sweep — the WORKING version of the reference's ``vis_embedding``
    (embedding.py:74-93, broken as shipped: its gauss branch reads a
    ``gauss_embed`` attribute that is never created).

    Plots sin(x * scale * 2^k) per band over x in [0, x_max]; when a
    random-Fourier matrix ``B`` is given ([3, F], ops/embedding.py::
    init_gaussian_embedding), its sorted per-feature norms are used as
    the frequency bands instead, matching the reference's intent."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if B is not None:
        bands = np.sort(np.linalg.norm(np.asarray(B), axis=0))
    else:
        nf = max_deg - min_deg + 1
        bands = 2.0 ** np.linspace(min_deg, max_deg, nf)
    x = np.linspace(0.0, x_max, n)
    emb = np.sin(x[:, None] * scale * bands[None, :])

    fig, ax = plt.subplots(figsize=(8, 3.2))
    im = ax.imshow(emb.T, cmap="hot", interpolation="nearest",
                   aspect="auto", origin="lower",
                   extent=[0, x_max, 0, emb.shape[1]])
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("x values")
    ax.set_ylabel("embeddings")
    fig.tight_layout()
    fig.savefig(out_file, dpi=110)
    plt.close(fig)
    return out_file


def ray_oracle_figure(trainer, out_file: str, slot: int = 0,
                      n_rays: int = 3, seed: int = 0,
                      rays: Optional[List[Dict[str, np.ndarray]]] = None):
    """Write the check_gt_sdf-style panel figure (one row per ray):
    GT SDF vs the ray / normal / batch-distance bounds and the predicted
    SDF along each sampled ray (reference trainer.py:890-935 layout)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if rays is None:
        rays = ray_oracle(trainer, slot=slot, n_rays=n_rays, seed=seed)
    fig, axes = plt.subplots(len(rays), 1,
                             figsize=(11, 3.3 * len(rays)), squeeze=False)
    series = [("gt", "True signed distance", "C1"),
              ("ray", "Ray", "C3"),
              ("normal", "Normal", "C2"),
              ("pc", "Batch distance", "C0")]
    for j, ray in enumerate(rays):
        ax = axes[j, 0]
        x = ray["z"]
        ax.hlines(0, x[0], x[-1], color="gray", linestyle="--", lw=1)
        for key, label, color in series:
            if key in ray and np.isfinite(ray[key]).any():
                ax.plot(x, ray[key], label=label, color=color, lw=2.5)
        ax.plot(x, ray["pred"], label="Predicted", color="k",
                linestyle=":", lw=2)
        if j == 0:
            ax.legend(fontsize=9, ncol=2)
        if j == len(rays) - 1:
            ax.set_xlabel("Distance along ray, d [m]")
    fig.text(0.04, 0.5, "Signed distance [m]", va="center",
             rotation="vertical")
    fig.savefig(out_file, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_file
