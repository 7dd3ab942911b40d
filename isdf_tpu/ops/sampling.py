"""Ray/pixel/depth sampling — static shapes, explicit validity masks.

The reference samples pixels then DROPS rays with invalid depth / NaN
normals, producing variable-length batches every step
(isdf/modules/sample.py:24-74). Dynamic shapes defeat XLA, so here every
step always carries n_frames * n_rays rays plus a boolean ``valid`` mask;
all downstream losses take masked means. The math is identical on the valid
set; invalid rays still flow through the MLP (their cost is negligible) but
contribute exactly zero loss.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RaySamples(NamedTuple):
    """Everything the loss needs about one step's ray batch.

    Shapes: R = n_frames * n_rays, S = n_surf + n_strat samples.
    """
    pc: jnp.ndarray            # [R, S, 3] world-space sample points
    z_vals: jnp.ndarray        # [R, S] z depth of each sample
    dirs_C: jnp.ndarray        # [R, 3] camera-frame ray dirs
    dirs_W: jnp.ndarray        # [R, 3] world-frame ray dirs
    origins: jnp.ndarray       # [R, 3] ray origins
    depth: jnp.ndarray         # [R] gt (z-)depth at sampled pixel
    T_WC: jnp.ndarray          # [R, 4, 4] pose of the ray's frame
    normals: jnp.ndarray       # [R, 3] gt surface normal (zeros if unused)
    valid: jnp.ndarray         # [R] bool: depth valid (and normal valid)
    indices_b: jnp.ndarray     # [R] window-slot index of each ray
    indices_h: jnp.ndarray     # [R]
    indices_w: jnp.ndarray     # [R]


def sample_pixels(key, n_rays: int, n_frames: int, H: int, W: int):
    """Uniform pixel draw: n_rays per frame (reference sample.py:11-21)."""
    kh, kw = jax.random.split(key)
    total = n_rays * n_frames
    ih = jax.random.randint(kh, (total,), 0, H)
    iw = jax.random.randint(kw, (total,), 0, W)
    ib = jnp.repeat(jnp.arange(n_frames), n_rays)
    return ib, ih, iw


def sample_pixels_active(key, n_rays: int, n_frames: int, H: int, W: int,
                         loss_grids, active_frac: float = 0.5):
    """Loss-guided pixel draw: the first ``active_frac`` of each frame's
    rays target image blocks with probability proportional to the frame's
    block-pooled loss (the loss_approx grid the engine already maintains,
    reference loss.py:208-218); the rest stay uniform for exploration.

    The reference stubs this capability (trainer.py:988-1001 commented
    out); here it is a working importance sampler. Frames whose grid is
    still empty (all zeros) degrade to uniform (the categorical's logits
    become constant). Shapes are static: per-ray mixture membership is a
    fixed ray-index split, so the jitted step stays monomorphic.

    loss_grids: [n_frames, fh, fw]. Returns (ib, ih, iw) like
    sample_pixels.
    """
    fh, fw = loss_grids.shape[-2:]
    kb, kh_, kw_, ku = jax.random.split(key, 4)
    total = n_rays * n_frames
    ib = jnp.repeat(jnp.arange(n_frames), n_rays)

    # uniform proposal
    ih_u = jax.random.randint(kh_, (total,), 0, H)
    iw_u = jax.random.randint(kw_, (total,), 0, W)

    # active proposal: categorical over blocks, then uniform in-block
    logw = jnp.log(jnp.maximum(loss_grids.reshape(n_frames, fh * fw),
                               1e-12))
    blocks = jax.random.categorical(
        kb, logw[:, None, :], axis=-1,
        shape=(n_frames, n_rays)).reshape(total)
    bh, bw = blocks // fw, blocks % fw
    h_blk, w_blk = H // fh, W // fw
    off = jax.random.randint(ku, (2, total), 0, max(h_blk, w_blk))
    ih_a = jnp.minimum(bh * h_blk + off[0] % h_blk, H - 1)
    iw_a = jnp.minimum(bw * w_blk + off[1] % w_blk, W - 1)

    n_active = int(round(n_rays * active_frac))
    is_active = (jnp.arange(total) % n_rays) < n_active
    return (ib, jnp.where(is_active, ih_a, ih_u),
            jnp.where(is_active, iw_a, iw_u))


def stratified_sample(key, min_depth, max_depth, n_bins: int):
    """One uniform sample per bin between min_depth and per-ray max_depth.

    min_depth: scalar or [R]; max_depth: [R]. Returns [R, n_bins].
    Reference: sample.py:77-128 (fixed-bin-count branch).
    """
    max_depth = jnp.asarray(max_depth)
    R = max_depth.shape[0]
    min_d = jnp.broadcast_to(jnp.asarray(min_depth, max_depth.dtype), (R,))
    sample_range = (max_depth - min_d)[:, None]
    lims = jnp.linspace(0.0, 1.0, n_bins + 1, dtype=max_depth.dtype)[None, :]
    bin_length = sample_range / n_bins
    lower = lims[:, :-1] * sample_range + min_d[:, None]
    incr = jax.random.uniform(key, (R, n_bins), max_depth.dtype) * bin_length
    return lower + incr


def sample_along_rays(
    key,
    T_WC,                 # [R, 4, 4]
    dirs_C,               # [R, 3]
    gt_depth,             # [R]
    min_depth: float,
    dist_behind_surf: float,
    n_strat_samples: int,
    n_surf_samples: int,
    surf_std: float = 0.1,
):
    """Sample S = n_surf + n_strat z-values and 3-D points along each ray.

    Sample layout matches the reference (sample.py:131-178):
    index 0 is the exact surface depth, indices 1..n_surf-1 are Gaussian
    (sigma=0.1) perturbations of it clamped to [min_depth, max_depth], the
    remainder are stratified in [min_depth, depth + dist_behind_surf].

    Returns (pc [R,S,3], z_vals [R,S], origins [R,3], dirs_W [R,3]).
    """
    from isdf_tpu.ops.geometry import origin_dirs_W

    k_strat, k_surf = jax.random.split(key)
    origins, dirs_W = origin_dirs_W(T_WC, dirs_C)
    max_depth = gt_depth + dist_behind_surf

    z_vals = stratified_sample(k_strat, min_depth, max_depth, n_strat_samples)

    if n_surf_samples > 0:
        R = gt_depth.shape[0]
        offsets = surf_std * jax.random.normal(
            k_surf, (R, n_surf_samples - 1), gt_depth.dtype)
        near_surf = jnp.clip(
            gt_depth[:, None] + offsets, min_depth, max_depth[:, None])
        z_vals = jnp.concatenate(
            [gt_depth[:, None], near_surf, z_vals], axis=1)

    pc = origins[:, None, :] + dirs_W[:, None, :] * z_vals[:, :, None]
    return pc, z_vals, origins, dirs_W


def sample_rays_from_frames(
    key,
    depth_batch,          # [F, H, W]
    T_WC_batch,           # [F, 4, 4]
    dirs_C_img,           # [H, W, 3]
    normal_batch: Optional[jnp.ndarray],   # [F, H, W, 3] or None
    frame_valid,          # [F] bool — mask for padded window slots
    n_rays: int,
    min_depth: float,
    dist_behind_surf: float,
    n_strat_samples: int,
    n_surf_samples: int,
) -> RaySamples:
    """The full per-step sampling pipeline: pixels -> gathers -> ray samples.

    Replaces reference sample_points (trainer.py:683-766). Invalid rays
    (zero depth / NaN normal / padded frame slot) are masked, not dropped;
    their depth is replaced by a safe value so no NaN/inf enters the jitted
    graph.
    """
    F, H, W = depth_batch.shape
    k_pix, k_ray = jax.random.split(key)

    ib, ih, iw = sample_pixels(k_pix, n_rays, F, H, W)

    depth = depth_batch[ib, ih, iw]
    valid = depth != 0.0
    valid &= frame_valid[ib]

    if normal_batch is not None:
        normals = normal_batch[ib, ih, iw]
        valid &= ~jnp.isnan(normals[..., 0])
        normals = jnp.where(jnp.isnan(normals), 0.0, normals)
    else:
        normals = jnp.zeros((depth.shape[0], 3), depth.dtype)

    # safe depth for masked rays: keeps z ranges positive, cost is masked out
    depth_safe = jnp.where(valid, depth, 1.0)

    dirs_C = dirs_C_img[ih, iw]
    T_WC = T_WC_batch[ib]

    pc, z_vals, origins, dirs_W = sample_along_rays(
        k_ray, T_WC, dirs_C, depth_safe,
        min_depth, dist_behind_surf, n_strat_samples, n_surf_samples)

    return RaySamples(
        pc=pc, z_vals=z_vals, dirs_C=dirs_C, dirs_W=dirs_W, origins=origins,
        depth=depth_safe, T_WC=T_WC, normals=normals, valid=valid,
        indices_b=ib, indices_h=ih, indices_w=iw)
