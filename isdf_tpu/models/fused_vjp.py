"""Hand-derived value+spatial-gradient MLP with a custom VJP.

The eikonal/normal losses differentiate through the SDF's spatial
gradient, so autodiff builds reverse-over-reverse graphs whose activation
traffic dominates the step. This module computes, for the iSDF MLP,

    (sdf raw, d sdf/dx raw)  =  f(params, pe, pe_tangents)

by forward-mode tangent propagation, and implements its parameter-VJP by
hand (tangent rows u_l = ta_{l-1} W_l, value rows z_l = a_{l-1} W_l + b):

    dz_l  = dh_l . sig_l  +  sum_k (dt_{l,k} . u_{l,k}) . sig'_l
    du_l  = dt_l . sig_l
    dW_l  = a_{l-1}^T dz_l + ta_{l-1}^T du_l ;  db_l = sum dz_l
    da    = dz_l W_l^T ;  dta = du_l W_l^T      (pe slice dropped at the
                                                 skip-concat layer)

with sig = sigmoid(100 z) (= softplus'_100) and
sig' = 100 sig (1 - sig) (= softplus''_100). Gradients w.r.t. pe and its
tangents are NOT produced — they are functions of the (constant) sample
positions only.

Two interchangeable executors share this math:
  * this file — plain jnp (the oracle, and a fast path in its own right);
  * models/pallas_mlp.py — Pallas kernels keeping the whole layer chain
    and the backward recompute in VMEM.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from isdf_tpu.models.sdf_mlp import SDFModel, _PRECISIONS


def pack_layers(params) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """[(W, b)] in execution order: in, mid1..., cat, mid2..., out."""
    seq = [params["in"], *params["mid1"], params["cat"],
           *params["mid2"], params["out"]]
    return [(p["w"], p["b"]) for p in seq]


def unpack_grads(params, gws, gbs):
    """Inverse of pack_layers for the gradient pytree."""
    B = len(params["mid1"])
    out = {
        "in": {"w": gws[0], "b": gbs[0]},
        "mid1": [{"w": gws[1 + i], "b": gbs[1 + i]} for i in range(B)],
        "cat": {"w": gws[1 + B], "b": gbs[1 + B]},
        "mid2": [{"w": gws[2 + B + i], "b": gbs[2 + B + i]}
                 for i in range(B)],
        "out": {"w": gws[2 + 2 * B], "b": gbs[2 + 2 * B]},
    }
    if "B" in params:
        out["B"] = jnp.zeros_like(params["B"])
    return out


def _sig100(z):
    return jax.nn.sigmoid(100.0 * z)


def _forward_trace(layers, cat_idx, pe, tan, prec):
    """Forward keeping residuals. tan: [3, N, E]. Returns
    (raw [N], graw [N,3], residuals)."""
    hs, tas, us, zs = [], [], [], []
    h, t = pe, tan
    L = len(layers)
    for l, (W, b) in enumerate(layers[:-1]):
        a = jnp.concatenate([h, pe], axis=-1) if l == cat_idx else h
        ta = (jnp.concatenate([t, tan], axis=-1) if l == cat_idx else t)
        z = jnp.matmul(a, W, precision=prec) + b
        u = jnp.matmul(ta, W, precision=prec)
        sig = _sig100(z)
        hs.append(a)
        tas.append(ta)
        zs.append(z)
        us.append(u)
        h = jax.nn.softplus(100.0 * z) * 0.01
        t = u * sig[None]
    W_out, b_out = layers[-1]
    raw = (jnp.matmul(h, W_out, precision=jax.lax.Precision.HIGHEST)
           + b_out)[..., 0]
    graw = jnp.matmul(t, W_out,
                      precision=jax.lax.Precision.HIGHEST)[..., 0].T  # [N,3]
    return raw, graw, (hs, tas, zs, us, h, t)


def _backward_trace(layers, cat_idx, residuals, draw, dgraw, prec, E):
    hs, tas, zs, us, h_last, t_last = residuals
    W_out, _ = layers[-1]
    N = draw.shape[0]

    K = dgraw.shape[1]
    gws, gbs = [None] * len(layers), [None] * len(layers)
    # head: raw = h W + b ; graw = t W
    dt_flat = dgraw.T[..., None]                         # [K, N, 1]
    gws[-1] = (jnp.matmul(h_last.T, draw[:, None], precision=prec)
               + sum(jnp.matmul(t_last[k].T, dt_flat[k], precision=prec)
                     for k in range(K)))
    gbs[-1] = draw.sum()[None]
    dh = jnp.matmul(draw[:, None], W_out.T, precision=prec)   # [N, 256]
    dt = jnp.matmul(dt_flat, W_out.T, precision=prec)         # [K, N, 256]

    for l in range(len(layers) - 2, -1, -1):
        W, _ = layers[l]
        z, u, a, ta = zs[l], us[l], hs[l], tas[l]
        sig = _sig100(z)
        sigp = 100.0 * sig * (1.0 - sig)
        du = dt * sig[None]
        dz = dh * sig + (dt * u).sum(0) * sigp
        gws[l] = (jnp.matmul(a.T, dz, precision=prec)
                  + sum(jnp.matmul(ta[k].T, du[k], precision=prec)
                        for k in range(K)))
        gbs[l] = dz.sum(0)
        if l > 0:
            da = jnp.matmul(dz, W.T, precision=prec)
            dta = jnp.matmul(du, W.T, precision=prec)
            if l == cat_idx:  # drop the pe slice of the skip concat
                da = da[:, :-E]
                dta = dta[..., :-E]
            dh, dt = da, dta
    return gws, gbs


def make_fused_mlp(model: SDFModel, n_blocks: int):
    """custom_vjp op: (params, pe [N,E], tan [3,N,E]) -> (raw, graw)."""
    cat_idx = 1 + n_blocks
    prec = _PRECISIONS[model.mm_precision]
    E = model.embedding_size

    @jax.custom_vjp
    def fused(params, pe, tan):
        layers = pack_layers(params)
        raw, graw, _ = _forward_trace(layers, cat_idx, pe, tan, prec)
        return raw, graw

    def fwd(params, pe, tan):
        layers = pack_layers(params)
        raw, graw, _ = _forward_trace(layers, cat_idx, pe, tan, prec)
        return (raw, graw), (params, pe, tan)

    def bwd(saved, cot):
        params, pe, tan = saved
        draw, dgraw = cot
        layers = pack_layers(params)
        # flash-style: recompute the residuals instead of saving them
        _, _, residuals = _forward_trace(layers, cat_idx, pe, tan, prec)
        gws, gbs = _backward_trace(layers, cat_idx, residuals, draw,
                                   dgraw, prec, E)
        return (unpack_grads(params, gws, gbs),
                jnp.zeros_like(pe), jnp.zeros_like(tan))

    fused.defvjp(fwd, bwd)
    return fused


def _forward_values(layers, cat_idx, pe, prec):
    """Forward only, keeping (a_l inputs, sig_l) residuals."""
    hs, sigs = [], []
    h = pe
    for l, (W, b) in enumerate(layers[:-1]):
        a = jnp.concatenate([h, pe], axis=-1) if l == cat_idx else h
        z = jnp.matmul(a, W, precision=prec) + b
        sig = _sig100(z)
        hs.append(a)
        sigs.append(sig)
        h = jax.nn.softplus(100.0 * z) * 0.01
    W_out, b_out = layers[-1]
    raw = (jnp.matmul(h, W_out, precision=jax.lax.Precision.HIGHEST)
           + b_out)[..., 0]
    return raw, h, hs, sigs


def _v_chain(layers, cat_idx, sigs, prec, E):
    """Reverse chain v_l = d raw / d h_l down to the pe level. Returns
    v_pe [N, E] = d raw / d pe (sum of the in-layer and skip paths)."""
    W_out, _ = layers[-1]
    N = sigs[0].shape[0]
    v = jnp.broadcast_to(W_out[:, 0][None, :], (N, W_out.shape[0]))
    v_pe = jnp.zeros((N, E), sigs[0].dtype)
    for l in range(len(layers) - 2, -1, -1):
        W, _ = layers[l]
        v = jnp.matmul(v * sigs[l], W.T, precision=prec)
        if l == cat_idx:
            v_pe = v_pe + v[:, -E:]
            v = v[:, :-E]
    return v_pe + v  # layer-0 input IS pe


def make_reverse_fused_mlp(model: SDFModel, n_blocks: int):
    """Reverse-form (sdf, d sdf/dx) with a single-combined-tangent custom
    backward, on the FACTORED PE Jacobian (sdf_mlp._pe_factored).

    Signature: fused(params, pe [N,E], cos_b [N,2F], dxs [3,3],
    dproj2 [3,2F]) -> (raw [N], graw [N,3]).

    Primal: forward (1 unit) + reverse v-chain (2 units); the world-space
    gradient contracts the factored tangents without ever materialising
    the [3,N,E] tangent tensor:
        graw = v_pe[:, :3] dxs^T + (cos_b * v_pe[:, 3:]) dproj2^T.
    Backward: the gradient cotangent dg [N,3] combines into ONE tangent
        m0 = [dg dxs, cos_b * (dg dproj2)]
    (<dg, grad f> = directional derivative of f along m0), so the
    parameter VJP is the K=1 tangent chain + its hand-derived reverse
    (~6 units). Total ~9 forward-units vs ~16 for the tangent form.
    """
    cat_idx = 1 + n_blocks
    prec = _PRECISIONS[model.mm_precision]
    hi = jax.lax.Precision.HIGHEST
    E = model.embedding_size

    def _primal(params, pe, cos_b, dxs, dproj2):
        layers = pack_layers(params)
        raw, _, _, sigs = _forward_values(layers, cat_idx, pe, prec)
        v_pe = _v_chain(layers, cat_idx, sigs, prec, E)
        # grad wrt world x through the factored PE tangents (metre-scale
        # and phase-sensitive: full-f32 like the PE projection itself)
        graw = (jnp.matmul(v_pe[:, :3], dxs.T, precision=hi)
                + jnp.matmul(cos_b * v_pe[:, 3:], dproj2.T, precision=hi))
        return raw, graw

    @jax.custom_vjp
    def fused(params, pe, cos_b, dxs, dproj2):
        return _primal(params, pe, cos_b, dxs, dproj2)

    def fwd(params, pe, cos_b, dxs, dproj2):
        return (_primal(params, pe, cos_b, dxs, dproj2),
                (params, pe, cos_b, dxs, dproj2))

    def bwd(saved, cot):
        params, pe, cos_b, dxs, dproj2 = saved
        draw, dgraw = cot
        layers = pack_layers(params)
        # combined tangent: <dg, grad f> == jvp of f along m0
        m0 = jnp.concatenate(
            [jnp.matmul(dgraw, dxs, precision=hi),
             cos_b * jnp.matmul(dgraw, dproj2, precision=hi)],
            axis=-1)[None]                                   # [1, N, E]
        _, _, residuals = _forward_trace(layers, cat_idx, pe, m0, prec)
        ones = jnp.ones((draw.shape[0], 1), draw.dtype)
        gws, gbs = _backward_trace(layers, cat_idx, residuals, draw,
                                   ones, prec, E)
        return (unpack_grads(params, gws, gbs), jnp.zeros_like(pe),
                jnp.zeros_like(cos_b), jnp.zeros_like(dxs),
                jnp.zeros_like(dproj2))

    fused.defvjp(fwd, bwd)
    return fused
