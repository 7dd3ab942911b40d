"""Frustum / visibility tests (reference: isdf/geometry/frustum.py).

Batched over frames; fully vectorised (one [F,3,N] matmul per test).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def frustum_normals(R_WC, H, W, fx, fy, cx, cy):
    """Inward normals of the 4 frustum side planes [4, 3].

    Reference: frustum.py:15-31.
    """
    c = jnp.array([0.0, W, W, 0.0])
    r = jnp.array([0.0, 0.0, H, H])
    x = (c - cx) / fx
    y = (r - cy) / fy
    corners_C = jnp.stack([x, y, jnp.ones(4)], axis=-1)          # [4,3]
    corners_W = corners_C @ R_WC.T
    n = jnp.cross(corners_W, jnp.roll(corners_W, -1, axis=0))
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def inside_frustum(points, cam_center, normals):
    """points [N,3] all on the positive side of every plane -> [N] bool."""
    d = (points - cam_center) @ normals.T
    return (d >= 0).all(axis=-1)


def is_visible(
    points,          # [N, 3]
    T_WC,            # [F, 4, 4]
    depth,           # [F, H, W]
    fx, fy, cx, cy,
    trunc: float = 0.2,
):
    """Visibility of points in each frame: projects inside the image and
    z in (0, observed depth + trunc). Returns [F, N] bool.

    Reference: frustum.py:44-133 (projection branch).
    """
    F, H, W = depth.shape
    N = points.shape[0]
    ones = jnp.ones((N, 1), points.dtype)
    homog = jnp.concatenate([points, ones], axis=-1)             # [N,4]

    R = T_WC[:, :3, :3]
    t = T_WC[:, :3, 3]
    # T_CW = [R^T | -R^T t] (rigid inverse — avoids a batched 4x4 solve)
    pts_C = jnp.einsum("fji,nj->fni", R, points) - jnp.einsum(
        "fji,fj->fi", R, t)[:, None, :]
    del homog

    z = pts_C[..., 2]
    u = fx * pts_C[..., 0] / z + cx
    v = fy * pts_C[..., 1] / z + cy

    xy_valid = (u > 0) & (u < W) & (v > 0) & (v < H)
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    f = jnp.arange(F)[:, None]
    depth_at = depth[f, vi, ui]
    max_depth = jnp.where(xy_valid, depth_at + trunc, -jnp.inf)
    z_valid = (z > 0) & (z < max_depth)
    return xy_valid & z_valid


def is_visible_np(points, T_WC, depth, fx, fy, cx, cy, trunc=0.2):
    """Numpy single-frame variant for host-side eval tooling."""
    out = np.asarray(is_visible(
        jnp.asarray(points), jnp.asarray(T_WC)[None],
        jnp.asarray(depth)[None], fx, fy, cx, cy, trunc))[0]
    return out
