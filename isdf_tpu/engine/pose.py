"""Pose refinement — SE(3) corrections per keyframe by SDF tracking.

The reference carries a ``pose_refine`` config section (pose_lr,
replicaCAD.json:81-83) and a custom autograd SO(3) exp map
(transform.py:307-368) but ships the feature disabled/unwired. Here it
is a working, optional capability: per-keyframe twist corrections
T_WC' = exp(xi) T_WC solved by damped Gauss-Newton against the frozen
map (KinectFusion-style SDF tracking), run by the loop on each ingested
frame. Enable with ``model.refine_poses``; see docs/ROADMAP.md item 9
for the design rationale (each guard exists for an observed failure
mode)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.ops import geometry as G
from isdf_tpu.ops import sampling as S


class PoseState(NamedTuple):
    twists: jnp.ndarray    # [C, 6] per-buffer-row correction


def init_pose_state(capacity: int, pose_lr: float = 4e-4):
    """(state, None). pose_lr is accepted for reference-schema
    compatibility; the GN solver has no learning rate (the second
    return slot held the late Adam's optimiser)."""
    del pose_lr
    return PoseState(jnp.zeros((capacity, 6))), None


def corrected_poses(twists, T_WC):
    """Apply exp(xi) on the left of each pose (f32 pose math — metre
    scale, see CLAUDE.md precision rules)."""
    return jnp.matmul(G.exp_se3(twists), T_WC,
                      precision=jax.lax.Precision.HIGHEST)


def build_pose_refine_step(model: M.SDFModel, optimiser=None,
                           n_rays: int = 200,
                           n_surf_samples: int = 8,
                           min_depth: float = 0.07,
                           sdf_gate: float = 0.3):
    """One jitted refinement step: sample surface points of selected
    frames through their corrected poses and minimise |sdf| there (the
    surface-consistency objective; map params frozen).

    sdf_gate: inlier gate — surface samples whose current |sdf| exceeds
    the gate are excluded. A frame entering a new region sees UNtrained
    map there (arbitrary large values/gradients); without the gate
    those frontier samples dominate and drag the pose toward whatever
    shrinks garbage.

    Solver: damped Gauss-Newton on a FIXED per-burst sample set (the
    KinectFusion-style SDF tracking normal equations), not a stochastic
    first-order optimiser. Residual r_i = sdf(x_i), analytic Jacobian
    J_i = [x_i x grad_i, grad_i] (twist layout [omega, v], left-applied,
    geometry.exp_se3); solve (J^T W J + lambda I) delta = -J^T W r per
    frame. The step VANISHES as the residuals do — an Adam burst at
    fixed lr injects ~lr*iters of random-walk into an already-correct
    pose (observed: stationary frames drifted 3-5 cm/burst), while GN
    leaves it untouched and converges quadratically from cm-scale
    error."""
    del optimiser  # the GN solver needs none; kept for API compatibility

    @functools.partial(jax.jit, donate_argnames=("pose_state",),
                       static_argnames=("n_steps",))
    def refine_step(params, pose_state: PoseState, depth_frames, T_WC,
                    rows, dirs_C_img, transform, key, n_steps: int = 1):
        """n GN iterations as one jitted dispatch. Returns
        (pose_state, losses [n_steps+1]) — truncated mean |sdf| per
        iter, with losses[0] = the PRE-burst loss prepended (callers
        gate on losses[0] vs losses[-1])."""
        F, H, W = depth_frames.shape
        k_pix, k_ray = jax.random.split(key)
        ib, ih, iw = S.sample_pixels(k_pix, n_rays, F, H, W)
        depth = depth_frames[ib, ih, iw]
        valid = depth != 0.0
        depth_safe = jnp.where(valid, depth, 1.0)
        dirs_C = dirs_C_img[ih, iw]
        # camera-frame surface samples, FIXED across iterations: exact
        # depth + (n_surf-1) Gaussian offsets along the ray
        offs = 0.05 * jax.random.normal(
            k_ray, (depth.shape[0], n_surf_samples - 1), depth.dtype)
        z = jnp.concatenate(
            [depth_safe[:, None],
             jnp.maximum(depth_safe[:, None] + offs, min_depth)], axis=1)
        x_C = dirs_C[:, None, :] * z[:, :, None]          # [R, S, 3]
        w_base = jnp.broadcast_to(
            valid[:, None], x_C.shape[:2]).astype(jnp.float32)

        HI = jax.lax.Precision.HIGHEST  # metre-scale pose math stays f32

        def residuals(twists):
            """(loss, per-sample (r, g, x, w, cam_f)) at twists;
            cam_f = per-FRAME corrected camera centres [F, 3]."""
            T_f = corrected_poses(twists[rows], T_WC)       # [F, 4, 4]
            T_corr = T_f[ib]
            x = jnp.einsum("rij,rsj->rsi", T_corr[:, :3, :3], x_C,
                           precision=HI) + T_corr[:, None, :3, 3]
            sdf, g = M.sdf_and_grad(params, x.reshape(-1, 3), model,
                                    transform=transform)
            r = sdf.reshape(x.shape[:2])
            g = g.reshape(x.shape)
            # trained-space discriminator: the eikonal-regularised map
            # has |grad| ~ 1 where it has been supervised; UNtrained
            # regions output sdf ~ 0 with small/odd gradients — without
            # this gate "drag everything into terra incognita where the
            # net says surface-everywhere" is the global minimum of
            # mean |sdf|
            gn = jnp.linalg.norm(g, axis=-1)
            grad_ok = (gn > 0.5) & (gn < 1.5)
            w = w_base * (jnp.abs(r) < sdf_gate) * grad_ok
            # the LOSS is truncated over ALL valid samples — averaging
            # the inliers only makes "push samples out of the gate" a
            # loss-decreasing runaway direction that LM happily accepts;
            # bad-gradient samples pay the full outlier cost
            rho = jnp.where(grad_ok, jnp.minimum(jnp.abs(r), sdf_gate),
                            sdf_gate)
            loss = (rho * w_base).sum() / jnp.maximum(w_base.sum(), 1.0)
            return loss, (r, g, x, w, T_f[:, :3, 3])

        def lm_iter(carry, _):
            # aux rides the carry: one residual evaluation per iteration
            # (the candidate's), not two
            twists, lam_scale, loss, (r, g, x, w, cam_f) = carry
            cam = cam_f[ib]
            # camera-centred rotation parametrisation: lever arm x - c
            # conditions H6 (|x-c| ~ depth) — a world-origin lever mixes
            # rotation/translation into a near-null direction that noisy
            # residuals push large steps through
            J = jnp.concatenate(
                [jnp.cross(x - cam[:, None, :], g), g], axis=-1)
            Jw = J * w[..., None]
            H6 = jax.ops.segment_sum(
                jnp.einsum("rsi,rsj->rij", Jw, J, precision=HI),
                ib, num_segments=F)
            b6 = jax.ops.segment_sum(
                -jnp.einsum("rsi,rs->ri", Jw, r, precision=HI),
                ib, num_segments=F)
            # spectral damping RELATIVE TO THE LARGEST EIGENVALUE: a
            # planar wall cannot observe in-plane sliding, so H6 has
            # near-null directions where noise in b drives large steps
            # (observed: capped steps every iteration at ~constant
            # loss). lambda ~ e_max suppresses exactly those.
            e, V = jnp.linalg.eigh(H6)                         # [F,6]
            lam = (jnp.maximum(lam_scale, 3e-2) * e[:, -1:]
                   + 1e-8)                                     # [F,1]
            delta = jnp.einsum(
                "fij,fj->fi", V,
                jnp.einsum("fji,fj->fi", V, b6) / (e + lam))   # [F, 6]
            # trust region + no-inlier guard
            n_in = jax.ops.segment_sum(w.sum(axis=1), ib, num_segments=F)
            scale = jnp.minimum(
                1.0, 0.05 / jnp.maximum(
                    jnp.abs(delta).max(axis=1, keepdims=True), 1e-12))
            delta = jnp.where(n_in[:, None] >= 6.0, delta * scale, 0.0)
            # convert camera-centred (omega, v_c) to world twist about
            # the CURRENT accepted centres:
            # x + omega x (x-c) + v_c = x + omega x x + (v_c - omega x c)
            dv = delta[:, 3:] - jnp.cross(delta[:, :3], cam_f)
            delta_w = jnp.concatenate([delta[:, :3], dv], axis=1)
            cand = twists.at[rows].add(delta_w)
            # LM accept/reject on the SAME sample set; require a real
            # decrease — noise-level "improvements" along unobservable
            # directions must terminate the iteration, not feed it.
            # NOTE: accept and lam_scale are scalars over the WHOLE
            # burst: with multiple frames one frame's regression vetoes
            # every frame's step and damping adapts jointly. That is why
            # the loop path uses n_frames=1 (pure tracking); multi-frame
            # bursts are a batched convenience with joint accept, not
            # per-frame LM
            new_loss, new_aux = residuals(cand)
            accept = new_loss < loss - 1e-4
            twists = jnp.where(accept, cand, twists)
            aux = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a),
                (r, g, x, w, cam_f), new_aux)
            lam_scale = jnp.where(accept,
                                  jnp.maximum(lam_scale / 3.0, 1e-4),
                                  jnp.minimum(lam_scale * 10.0, 1e3))
            loss = jnp.where(accept, new_loss, loss)
            return (twists, lam_scale, loss, aux), loss

        loss0, aux0 = residuals(pose_state.twists)
        (twists, _, _, _), losses = jax.lax.scan(
            lm_iter, (pose_state.twists, jnp.float32(1e-2), loss0, aux0),
            None, length=n_steps)
        # losses[0] = the PRE-burst loss so callers can judge how much
        # evidence the correction carries (Trainer.apply_pose_corrections
        # discards weak-evidence corrections)
        return PoseState(twists), jnp.concatenate([loss0[None], losses])

    return refine_step
