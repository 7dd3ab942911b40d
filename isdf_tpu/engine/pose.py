"""Pose refinement — jointly optimise small SE(3) corrections per keyframe.

The reference carries a ``pose_refine`` config section (pose_lr,
replicaCAD.json:81-83) and a custom autograd SO(3) exp map
(transform.py:307-368) but ships the feature disabled/unwired. Here it is
a working, optional capability: per-keyframe twist parameters applied as
left-multiplied corrections T_WC' = exp(xi) T_WC inside the same loss,
optimised by a separate Adam alongside the map (as in iSDF-style joint
mapping/tracking systems). Enable with ``refine_poses`` in the engine API.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.ops import geometry as G
from isdf_tpu.ops import sampling as S


class PoseState(NamedTuple):
    twists: jnp.ndarray    # [C, 6] per-buffer-row correction
    opt_state: Any


def init_pose_state(capacity: int, pose_lr: float = 4e-4):
    opt = optax.adam(pose_lr)
    twists = jnp.zeros((capacity, 6))
    return PoseState(twists, opt.init(twists)), opt


def corrected_poses(twists, T_WC):
    """Apply exp(xi) on the left of each pose."""
    return G.exp_se3(twists) @ T_WC


def build_pose_refine_step(model: M.SDFModel, optimiser,
                           n_rays: int = 200,
                           n_surf_samples: int = 8,
                           min_depth: float = 0.07):
    """One jitted refinement step: sample surface points of selected
    frames through their corrected poses and minimise |sdf| there (the
    surface-consistency objective; map params frozen)."""

    def _one_step(params, pose_state: PoseState, depth_frames, T_WC,
                  rows, dirs_C_img, transform, key):
        F, H, W = depth_frames.shape

        def loss_fn(twists):
            k_pix, k_ray = jax.random.split(key)
            ib, ih, iw = S.sample_pixels(k_pix, n_rays, F, H, W)
            depth = depth_frames[ib, ih, iw]
            valid = depth != 0.0
            depth_safe = jnp.where(valid, depth, 1.0)
            T_corr = corrected_poses(twists[rows], T_WC)[ib]
            dirs_C = dirs_C_img[ih, iw]
            pc, z_vals, _, _ = S.sample_along_rays(
                k_ray, T_corr, dirs_C, depth_safe, min_depth,
                0.0, 1, n_surf_samples, surf_std=0.05)
            sdf = M.apply(params, pc, model, transform=transform)
            # sample layout (sampling.py:143): [exact surf,
            # n_surf-1 near-surf, 1 stratified]. Only SURFACE samples
            # belong in the |sdf| objective — the stratified free-space
            # sample legitimately has |sdf| up to metres and pulling it
            # to zero drags the pose off the true optimum.
            is_surf = jnp.arange(sdf.shape[1]) < n_surf_samples
            w = (valid[:, None] & is_surf[None, :]).astype(sdf.dtype)
            return (jnp.abs(sdf) * w).sum() / jnp.maximum(w.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(pose_state.twists)
        # only selected rows receive gradient; others' grads are zero
        updates, opt_state = optimiser.update(grads, pose_state.opt_state,
                                              pose_state.twists)
        twists = optax.apply_updates(pose_state.twists, updates)
        return PoseState(twists, opt_state), loss

    @functools.partial(jax.jit, donate_argnames=("pose_state",),
                       static_argnames=("n_steps",))
    def refine_step(params, pose_state: PoseState, depth_frames, T_WC,
                    rows, dirs_C_img, transform, key, n_steps: int = 1):
        """n refine steps as one lax.scan dispatch (the in-loop form —
        per-step dispatch would pay one tunnel RTT per iteration).
        Returns (pose_state, losses [n_steps])."""
        keys = jax.random.split(key, n_steps)

        def body(st, k):
            st, loss = _one_step(params, st, depth_frames, T_WC, rows,
                                 dirs_C_img, transform, k)
            return st, loss

        pose_state, losses = jax.lax.scan(body, pose_state, keys)
        return pose_state, losses

    return refine_step
