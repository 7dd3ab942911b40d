"""The SDF MLP — params as a plain pytree, apply as a pure function.

Architecture (capability-matched to the reference SDFMap,
isdf/modules/fc_map.py:63-111):

    pe = encode(x)                                  # 255 for defaults
    h  = sp(W_in pe + b)                            # 256
    h  = blocks1(h)                                 # hidden_layers_block x 256
    h  = sp(W_cat [h, pe] + b)                      # skip connection
    h  = blocks2(h)
    sdf = scale_output * (W_out h + b [+ noise])

where sp is Softplus(beta=100). Weights are Xavier-normal, biases keep the
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) init so the initial function distribution
matches the reference's.

TPU notes:
  * the whole forward is 6 [N,256]x[256,256]-class matmuls — MXU-shaped;
    compute dtype is switchable to bfloat16 with a float32 head;
  * spatial gradients for eikonal/normal losses come from one extra VJP
    (jax.grad of the summed output), not autograd graph surgery;
  * params are a dict pytree usable directly with optax and donate-able.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from isdf_tpu.ops import embedding as emb

Params = Dict[str, Any]


def softplus_b100(x):
    """Softplus with beta=100 (reference: fc_map.py:51-55).

    jax.nn.softplus is the numerically-stable logaddexp form, so this is
    smooth and second-order differentiable everywhere (needed: eikonal loss
    differentiates through the gradient).
    """
    return jax.nn.softplus(100.0 * x) * 0.01


@dataclasses.dataclass(frozen=True)
class SDFModel:
    """Static model description (hashable; close over it in jit)."""
    embedding_size: int = 255
    hidden_size: int = 256
    hidden_layers_block: int = 2
    scale_output: float = 0.14
    scale_input: float = 0.05937489
    min_deg: int = 0
    max_deg: int = 5
    gauss_embed: bool = False
    gauss_embed_std: float = 11.0
    compute_dtype: Any = jnp.float32
    # MXU passes for the hidden matmuls: "default" (1 bf16 pass, fastest),
    # "high" (bf16x3), "highest" (true f32, 6 passes). The PE projection
    # and output head always run at full f32 (see ops/embedding.py).
    mm_precision: str = "default"

    def encode(self, params: Params, x, transform=None):
        """Positional encoding of world-space points [..., 3]."""
        if self.gauss_embed:
            return emb.gaussian_encoding(
                x, params["B"], transform=transform, scale=self.scale_input)
        return emb.positional_encoding(
            x, transform=transform, scale=self.scale_input,
            min_deg=self.min_deg, max_deg=self.max_deg)


def _init_linear(key, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    std = jnp.sqrt(2.0 / (fan_in + fan_out))  # Xavier normal
    w = std * jax.random.normal(kw, (fan_in, fan_out), dtype=jnp.float32)
    bound = 1.0 / jnp.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_params(key, model: SDFModel) -> Params:
    E, H, B = model.embedding_size, model.hidden_size, model.hidden_layers_block
    keys = jax.random.split(key, 2 * B + 4)
    params: Params = {
        "in": _init_linear(keys[0], E, H),
        "mid1": [_init_linear(keys[1 + i], H, H) for i in range(B)],
        "cat": _init_linear(keys[1 + B], H + E, H),
        "mid2": [_init_linear(keys[2 + B + i], H, H) for i in range(B)],
        "out": _init_linear(keys[2 + 2 * B], H, 1),
    }
    if model.gauss_embed:
        n_feats = (model.embedding_size - 3) // 2
        params["B"] = emb.init_gaussian_embedding(
            keys[3 + 2 * B], model.gauss_embed_std, n_feats)
    return params


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _linear(p, x, dtype, precision=jax.lax.Precision.HIGHEST):
    y = jnp.matmul(x.astype(dtype), p["w"].astype(dtype),
                   precision=precision)
    return y + p["b"].astype(dtype)


def apply(params: Params, x, model: SDFModel, transform=None):
    """SDF value at world points x [..., 3] -> [...].

    Pure forward, no noise (reference fc_map.py:94-111 with noise_std=None).
    """
    dt = model.compute_dtype
    prec = _PRECISIONS[model.mm_precision]
    pe = model.encode(params, x, transform=transform).astype(dt)
    h = softplus_b100(_linear(params["in"], pe, dt, prec))
    for p in params["mid1"]:
        h = softplus_b100(_linear(p, h, dt, prec))
    h = jnp.concatenate([h, pe], axis=-1)
    h = softplus_b100(_linear(params["cat"], h, dt, prec))
    for p in params["mid2"]:
        h = softplus_b100(_linear(p, h, dt, prec))
    # the scalar head stays full-f32: sdf values are metres and cm-level
    # absolute accuracy is the product
    raw = _linear(params["out"], h, jnp.float32)[..., 0]
    return raw * model.scale_output


def apply_with_noise(params, x, model: SDFModel, key, noise_std,
                     transform=None):
    """Forward with Gaussian output noise, annealed per frame regime.

    Matches reference fc_map.py:106-109: noise is added to the raw output
    BEFORE scale_output. noise_std may be a traced scalar (0 disables noise
    numerically — keeps the jitted step monomorphic).
    """
    raw = apply(params, x, model, transform=transform) / model.scale_output
    noise = jax.random.normal(key, raw.shape, raw.dtype) * noise_std
    return (raw + noise) * model.scale_output


def sdf_and_grad(params, x, model: SDFModel, transform=None):
    """SDF values and spatial gradients d sdf / d x at points [..., 3].

    One forward + one VJP (each point's sdf depends only on that point, so
    grad of the sum gives per-point gradients). Replaces the reference's
    torch.autograd.grad(create_graph=True) (fc_map.py:12-22); the returned
    grads remain differentiable w.r.t. params for the eikonal double
    backward.
    """
    def _sum(xp):
        return apply(params, xp, model, transform=transform).sum()

    sdf = apply(params, x, model, transform=transform)
    grad = jax.grad(_sum)(x)
    return sdf, grad


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# fused value+gradient path (TPU fast path)
# ---------------------------------------------------------------------------

def _sigmoid100(z):
    return jax.nn.sigmoid(100.0 * z)


def _pe_and_tangents(x, model: SDFModel, transform):
    """Icosahedron PE values [N, E] and spatial tangents [3, N, E].

    Hand-rolled forward-mode through the encoding: with
    xs = s(Rx + t), proj = xs @ D, the tangent of proj along world axis k
    is the CONSTANT matrix C[k] = s (R^T D)[k], so the PE Jacobian costs
    one cos over the same phase arguments as the sin of the forward.
    """
    from isdf_tpu.ops import embedding as emb

    nf = model.max_deg - model.min_deg + 1
    bands = 2.0 ** jnp.linspace(model.min_deg, model.max_deg, nf
                                ).astype(x.dtype)
    D = jnp.asarray(emb.ICOSAHEDRON_DIRS.T, dtype=x.dtype)     # [3, 21]
    s = jnp.asarray(model.scale_input, x.dtype)
    if transform is not None:
        R = transform[:3, :3].astype(x.dtype)
        t = transform[:3, 3].astype(x.dtype)
        xs = (jnp.einsum("ij,...j->...i", R, x,
                         precision=jax.lax.Precision.HIGHEST) + t) * s
        C = s * jnp.matmul(R.T, D,
                           precision=jax.lax.Precision.HIGHEST)  # [3, 21]
        dxs = s * R.T                                            # [3(k), 3]
    else:
        xs = x * s
        C = s * D
        dxs = s * jnp.eye(3, dtype=x.dtype)

    proj = jnp.matmul(xs, D, precision=jax.lax.Precision.HIGHEST)  # [N, 21]
    N = proj.shape[0]
    xb = (proj[:, :, None] * bands).reshape(N, -1)               # [N, 21*nf]
    args = jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1)
    pe = jnp.concatenate([xs, jnp.sin(args)], axis=-1)           # [N, E]

    cos_b = jnp.cos(args)                                        # [N, 2*21*nf]
    dproj = (C[:, :, None] * bands).reshape(3, -1)               # [3, 21*nf]
    dproj2 = jnp.concatenate([dproj, dproj], axis=-1)            # [3, 2*21*nf]
    tangents = jnp.concatenate([
        jnp.broadcast_to(dxs[:, None, :], (3, N, 3)),
        cos_b[None] * dproj2[:, None, :],
    ], axis=-1)                                                  # [3, N, E]
    return pe, tangents


def _pe_factored(x, model: SDFModel, transform):
    """Factored PE Jacobian: (pe [N,E], cos_b [N,2F], dxs [3,3],
    dproj2 [3,2F]) with F = 21 * n_freqs.

    The full tangent tensor tan [3,N,E] of `_pe_and_tangents` is rank-1 in
    its constant factors: tan[k,n,:3] = dxs[k], tan[k,n,3:] =
    cos_b[n] * dproj2[k]. Passing the factors instead of materialising tan
    removes ~85 MB of HBM traffic per training step (N=27k, f32), and
    cos_b itself is a column permutation of pe:
    cos(xb) = pe's phase-shifted sin block, cos(xb + pi/2) = -sin(xb).
    """
    nf = model.max_deg - model.min_deg + 1
    bands = 2.0 ** jnp.linspace(model.min_deg, model.max_deg, nf
                                ).astype(x.dtype)
    D = jnp.asarray(emb.ICOSAHEDRON_DIRS.T, dtype=x.dtype)     # [3, 21]
    s = jnp.asarray(model.scale_input, x.dtype)
    if transform is not None:
        R = transform[:3, :3].astype(x.dtype)
        t = transform[:3, 3].astype(x.dtype)
        xs = (jnp.einsum("ij,...j->...i", R, x,
                         precision=jax.lax.Precision.HIGHEST) + t) * s
        C = s * jnp.matmul(R.T, D,
                           precision=jax.lax.Precision.HIGHEST)  # [3, 21]
        dxs = s * R.T                                            # [3(k), 3]
    else:
        xs = x * s
        C = s * D
        dxs = s * jnp.eye(3, dtype=x.dtype)

    proj = jnp.matmul(xs, D, precision=jax.lax.Precision.HIGHEST)  # [N, 21]
    F = D.shape[1] * nf
    # xb[n, d*nf+j] = proj[n, d] * bands[j] as ONE matmul against a sparse
    # selection matrix: a broadcast+reshape here would materialise a
    # transposed [N, 21, nf] layout that XLA then relayouts (measured
    # ~60 us/step of copies in the training step)
    sel = jnp.zeros((D.shape[1], F), x.dtype).at[
        jnp.repeat(jnp.arange(D.shape[1]), nf),
        jnp.arange(F)].set(jnp.tile(bands, D.shape[1]))
    xb = jnp.matmul(proj, sel, precision=jax.lax.Precision.HIGHEST)
    sin_b, cos_half = jnp.sin(xb), jnp.cos(xb)
    pe = jnp.concatenate([xs, sin_b, cos_half], axis=-1)         # [N, E]
    cos_b = jnp.concatenate([cos_half, -sin_b], axis=-1)         # [N, 2F]
    dproj = (C[:, :, None] * bands).reshape(3, F)
    dproj2 = jnp.concatenate([dproj, dproj], axis=-1)            # [3, 2F]
    return pe, cos_b, dxs, dproj2


def _pe_consts(model: SDFModel, transform):
    """Point-INDEPENDENT pieces of the factored PE, for building the
    encoding inside a Pallas kernel (models/pallas_mlp.py pe_in_kernel):

      M [128, 256] f32 — packed affine plane: for an input row
        r = [x, y, z, 1, 0...] (world point + homogeneous 1),
        pre = r @ M has lanes [xs(3) | xb(F) | xb(F) | 0pad], so
        pe = [pre[:3], sin(pre[3:3+F]), cos(pre[3+F:3+2F])].
        (The PE is affine in the world point before the sinusoids:
        xs = s(Rx+t), xb = xs @ D @ sel.)
      dxs [3,3], dproj2 [3,2F] — the tangent constants of _pe_factored.
    """
    nf = model.max_deg - model.min_deg + 1
    bands = 2.0 ** jnp.linspace(model.min_deg, model.max_deg, nf
                                ).astype(jnp.float32)
    D = jnp.asarray(emb.ICOSAHEDRON_DIRS.T, jnp.float32)       # [3, 21]
    s = jnp.float32(model.scale_input)
    if transform is not None:
        R = transform[:3, :3].astype(jnp.float32)
        t = transform[:3, 3].astype(jnp.float32)
    else:
        R = jnp.eye(3, dtype=jnp.float32)
        t = jnp.zeros((3,), jnp.float32)
    A = s * R                                                  # xs = A x + s t
    c = s * t
    C = s * jnp.matmul(R.T, D, precision=jax.lax.Precision.HIGHEST)
    dxs = s * R.T
    F = D.shape[1] * nf
    dproj = (C[:, :, None] * bands).reshape(3, F)
    dproj2 = jnp.concatenate([dproj, dproj], axis=-1)          # [3, 2F]

    # xb = xs @ P with P[j, d*nf+k] = D[j, d] * bands[k]
    P = (D[:, :, None] * bands).reshape(3, F)                  # [3, F]
    AP = jnp.matmul(A.T, P, precision=jax.lax.Precision.HIGHEST)
    cP = jnp.matmul(c[None, :], P,
                    precision=jax.lax.Precision.HIGHEST)[0]    # [F]
    M = jnp.zeros((128, 256), jnp.float32)
    M = M.at[:3, :3].set(A.T)
    M = M.at[3, :3].set(c)
    M = M.at[:3, 3:3 + F].set(AP)
    M = M.at[3, 3:3 + F].set(cP)
    M = M.at[:3, 3 + F:3 + 2 * F].set(AP)
    M = M.at[3, 3 + F:3 + 2 * F].set(cP)
    return M, dxs, dproj2


def sdf_and_grad_fused(params, x, model: SDFModel, transform=None):
    """(sdf [N], d sdf/dx [N, 3]) via one stacked matmul chain.

    The three spatial tangents ride the SAME matmuls as the values (batch
    rows 4N instead of N), with tangent rows scaled by sigmoid(100 z)
    after each layer — a single op chain instead of forward + VJP graphs.
    Exactly equal (to fp error) to sdf_and_grad; remains differentiable in
    params for the eikonal double backward (autodiff sees sigmoid', i.e.
    the second derivative of softplus).
    """
    if model.gauss_embed:  # fused PE tangents implemented for the ico PE
        return sdf_and_grad(params, x, model, transform)

    dt = model.compute_dtype
    prec = _PRECISIONS[model.mm_precision]
    pe, tan = _pe_and_tangents(x, model, transform)
    N, E = pe.shape
    pe = pe.astype(dt)
    tan = tan.astype(dt)

    def layer(p, h, t):
        # one [4N, in] x [in, out] matmul carries values + 3 tangents
        nin = h.shape[-1]
        X = jnp.concatenate([h, t.reshape(3 * N, nin)], axis=0)
        Y = jnp.matmul(X, p["w"].astype(dt), precision=prec)
        z = Y[:N] + p["b"].astype(dt)
        tz = Y[N:].reshape(3, N, -1)
        return softplus_b100(z), tz * _sigmoid100(z)[None]

    h, t = layer(params["in"], pe, tan)
    for p in params["mid1"]:
        h, t = layer(p, h, t)
    h = jnp.concatenate([h, pe], axis=-1)
    t = jnp.concatenate([t, tan], axis=-1)
    h, t = layer(params["cat"], h, t)
    for p in params["mid2"]:
        h, t = layer(p, h, t)

    w_out = params["out"]["w"].astype(jnp.float32)
    raw = (jnp.matmul(h.astype(jnp.float32), w_out,
                      precision=jax.lax.Precision.HIGHEST)
           + params["out"]["b"])[..., 0]
    grad = jnp.matmul(t.astype(jnp.float32), w_out,
                      precision=jax.lax.Precision.HIGHEST)[..., 0]  # [3, N]
    return raw * model.scale_output, grad.T * model.scale_output
