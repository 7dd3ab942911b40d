"""Depth / normal rendering from the SDF along sampled rays.

Reference: isdf/modules/render.py. Sphere-tracing-free: with samples
already drawn along each ray, depth is recovered at the first sign
crossing (sdf < 0) as z + sdf there.
"""

from __future__ import annotations

import jax.numpy as jnp

from isdf_tpu.ops.geometry import origin_dirs_W


def sdf_render_depth(z_vals, sdf):
    """Render depth at the first negative-SDF sample along each ray.

    z_vals [R, S] must be ascending; sdf [R, S]. Rays with no crossing, or
    whose first crossing is the last sample, render depth 0.
    Reference: render.py:12-35 (argmax-of-weighted-mask trick; here the
    no-crossing case is explicit instead of relying on argmax tie order).
    """
    S = sdf.shape[1]
    inside = sdf < 0
    ixs = jnp.arange(S, 0, -1, dtype=sdf.dtype)
    first_inside = jnp.argmax(inside * ixs, axis=1)
    r = jnp.arange(sdf.shape[0])
    depth = z_vals[r, first_inside] + sdf[r, first_inside]
    no_crossing = ~inside.any(axis=1)
    depth = jnp.where(no_crossing | (first_inside == S - 1), 0.0, depth)
    return depth


def sort_by_z(z_vals, *mats):
    """Ascending sort of z_vals, reordering companion [R, S] arrays."""
    order = jnp.argsort(z_vals, axis=-1)
    out = [jnp.take_along_axis(z_vals, order, axis=-1)]
    for m in mats:
        out.append(jnp.take_along_axis(m, order, axis=-1))
    return tuple(out)


def render_normals_C(T_WC, render_depth, sdf_grad_fn, dirs_C):
    """Camera-frame surface normals at rendered depths.

    sdf_grad_fn: pc [N,3] -> grad [N,3] (the model's spatial gradient).
    Reference: render.py:39-57.
    """
    origins, dirs_W = origin_dirs_W(T_WC, dirs_C)
    pc = origins + dirs_W * render_depth[..., None]
    grad = sdf_grad_fn(pc)
    normals_W = -grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-4)
    R_CW = jnp.swapaxes(T_WC[..., :3, :3], -1, -2)
    normals_C = jnp.einsum("...ij,...j->...i", R_CW, normals_W)
    return normals_C


def render_weighted(weights, vals, axis=-1, normalise: bool = False):
    """Generic weighted-sum render (reference render.py:60-70)."""
    out = (weights * vals).sum(axis=axis)
    if normalise:
        out = out / weights.shape[axis]
    return out
