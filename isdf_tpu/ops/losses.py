"""SDF losses — masked-static equivalents of the reference loss pipeline.

Reference: isdf/modules/loss.py:122-240 and the loss assembly in
isdf/modules/trainer.py:768-868. All reductions are masked means over the
valid-ray set, reproducing the reference's behaviour of dropping invalid
rays before reducing.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from isdf_tpu.ops.bounds import cos_sim


def full_sdf_loss(sdf, target_sdf, free_space_factor: float = 5.0):
    """Free-space hinge + truncation residual (reference loss.py:148-164).

    free space: max(relu(sdf - b), exp(-5 sdf) - 1)   [penalise sdf > bound
                and heavily penalise negative sdf in observed free space]
    truncation: sdf - b
    """
    free = jnp.maximum(jax.nn.relu(sdf - target_sdf),
                       jnp.exp(-free_space_factor * sdf) - 1.0)
    trunc = sdf - target_sdf
    return free, trunc


def sdf_loss(sdf, bounds, trunc_distance: float, loss_type: str = "L1"):
    """Split by bound > trunc distance, apply L1/L2 (loss.py:122-145).

    Returns (loss_mat [R,S], free_space_mask [R,S]).
    """
    free, trunc = full_sdf_loss(sdf, bounds)
    free_space = bounds > trunc_distance
    mat = jnp.where(free_space, free, trunc)
    if loss_type == "L1":
        mat = jnp.abs(mat)
    elif loss_type == "L2":
        mat = jnp.square(mat)
    else:
        raise ValueError("loss_type must be L1 or L2")
    return mat, free_space


def masked_mean(x, mask, axis=None):
    """Mean of x over elements where mask is True (0 if none)."""
    mask = mask.astype(x.dtype)
    s = (x * mask).sum(axis=axis)
    n = mask.sum(axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)


class TotalLoss(NamedTuple):
    total: jnp.ndarray                 # scalar
    mat: jnp.ndarray                   # [R, S] per-sample total loss
    scalars: Dict[str, jnp.ndarray]    # logging scalars (device)


def tot_loss(
    sdf_loss_mat,            # [R, S]
    grad_loss_mat,           # [R, S] or None
    eik_loss_mat,            # [R, S] or None
    free_space_mask,         # [R, S]
    bounds,                  # [R, S]
    ray_valid,               # [R]
    eik_apply_dist: float,
    trunc_weight: float,
    grad_weight: float,
    eik_weight: float,
) -> TotalLoss:
    """Weighted combination (reference loss.py:178-205) with ray masking.

    Scalar log values mirror the reference exactly: sdf/grad terms are
    logged before weighting, the eikonal term after.
    """
    vmask = ray_valid[:, None] & jnp.ones_like(sdf_loss_mat, bool)

    sdf_mat = jnp.where(free_space_mask, sdf_loss_mat,
                        sdf_loss_mat * trunc_weight)
    scalars = {"sdf_loss": masked_mean(sdf_mat, vmask)}
    total_mat = sdf_mat

    if grad_loss_mat is not None:
        total_mat = total_mat + grad_weight * grad_loss_mat
        scalars["grad_loss"] = masked_mean(grad_loss_mat, vmask)

    if eik_loss_mat is not None:
        eik = jnp.where(bounds < eik_apply_dist, 0.0, eik_loss_mat)
        eik = eik * eik_weight
        total_mat = total_mat + eik
        scalars["eikonal_loss"] = masked_mean(eik, vmask)

    total_mat = total_mat * ray_valid[:, None].astype(total_mat.dtype)
    total = masked_mean(total_mat, vmask)
    scalars["total_loss"] = total
    return TotalLoss(total, total_mat, scalars)


def grad_cosine_loss(
    sdf_grad,            # [R, S, 3] predicted spatial gradients
    grad_vec,            # [R, S-1, 3] approx gradient targets from bounds
    grad_vec_valid,      # [R, S-1] bool or None
    normals,             # [R, 3] gt surface normals
    orien_loss: bool = False,
):
    """Surface-normal + gradient-direction cosine losses.

    Reference assembly: trainer.py:818-830 — sample 0 supervises the
    predicted gradient against the frame's surface normal; samples 1..S-1
    against the bounds-derived gradient target (NaN targets replaced by the
    surface normal, trainer.py:823-824).
    """
    surf_loss = 1.0 - cos_sim(sdf_grad[:, 0], normals)           # [R]
    if grad_vec_valid is not None:
        grad_vec = jnp.where(
            grad_vec_valid[..., None], grad_vec, normals[:, None, :])
    ray_loss = 1.0 - cos_sim(grad_vec, sdf_grad[:, 1:])          # [R, S-1]
    mat = jnp.concatenate([surf_loss[:, None], ray_loss], axis=1)
    if orien_loss:
        mat = (mat > 1.0).astype(mat.dtype)
    return mat


def frame_avg_loss(
    ray_loss,            # [R] per-ray total loss (summed over samples)
    ray_valid,           # [R]
    indices_b, indices_h, indices_w,
    n_frames: int, H: int, W: int,
    factor: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame average loss via block pooling (reference loss.py:208-240).

    The reference scatters per-ray losses into a full [F, H, W] image then
    8x8-block-pools it. Equivalent, without materialising the image:
    segment-sum per-ray losses and active counts directly into the
    [F, factor, factor] block grid.

    Returns (loss_approx [F, factor, factor], frame_avg [F]).
    """
    h_block = H // factor
    w_block = W // factor
    block = (indices_b * (factor * factor)
             + (indices_h // h_block).clip(0, factor - 1) * factor
             + (indices_w // w_block).clip(0, factor - 1))
    n_seg = n_frames * factor * factor

    w = ray_valid.astype(ray_loss.dtype)
    sums = jax.ops.segment_sum(ray_loss * w, block, num_segments=n_seg)
    counts = jax.ops.segment_sum(w, block, num_segments=n_seg)
    loss_approx = sums / jnp.maximum(counts, 1.0)
    loss_approx = loss_approx.reshape(n_frames, factor, factor)
    frame_avg = loss_approx.sum(axis=(1, 2)) / (factor * factor)
    return loss_approx, frame_avg
