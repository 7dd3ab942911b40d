"""Pallas kernel for the reverse-form MLP primal: (sdf, d sdf/d pe).

Fuses the forward chain AND the reverse v-chain of the iSDF MLP into one
VMEM-resident kernel: activations never touch HBM, softplus/sigmoid are
computed in-register between the matmuls, and per-op dispatch disappears.
The parameter backward stays the hand-derived (validated) jnp custom VJP
in models/fused_vjp.py — pallas forward, jnp backward.

Layout: weights packed as [L, 512, 256] f32 (rows beyond each layer's
fan-in zero; the out layer occupies column 0 of its slot), biases as
[8 (pad), L*256]. Points ride in row tiles of TM; E==255 is padded to 256
with zero columns (and matching zero weight rows).

Restrictions (asserted): hidden_size == 256, icosahedron PE (E <= 256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isdf_tpu.models.fused_vjp import (_PRECISIONS, make_reverse_fused_mlp,
                                       pack_layers)
from isdf_tpu.models.sdf_mlp import SDFModel

HID = 256
CAT = 512


def _pack_params(params):
    layers = pack_layers(params)
    L = len(layers)
    Wp = jnp.zeros((L, CAT, HID), jnp.float32)
    bp = jnp.zeros((8, L * HID), jnp.float32)
    for l, (W, b) in enumerate(layers):
        if l == L - 1:  # out layer [HID, 1] -> column 0
            Wp = Wp.at[l, :W.shape[0], 0].set(W[:, 0])
            bp = bp.at[0, l * HID].set(b[0])
        else:
            Wp = Wp.at[l, :W.shape[0], :].set(W)
            bp = bp.at[0, l * HID:(l + 1) * HID].set(b)
    return Wp, bp


def _make_kernel(L: int, cat_idx: int, E: int, prec):
    n_hidden = L - 1  # layers with softplus

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def _dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def kernel(pe_ref, t0_ref, t1_ref, t2_ref, W_ref, b_ref, out_ref,
               sig_ref):
        pe = pe_ref[:]                                   # [TM, 256]
        h = pe
        for l in range(n_hidden):
            # skip-concat expressed as two partial dots (no 512-wide temp)
            z = _dot(h, W_ref[l, :HID, :])
            if l == cat_idx:
                z = z + _dot(pe, W_ref[l, HID:, :])
            z = z + b_ref[0, l * HID:(l + 1) * HID]
            sig = jax.nn.sigmoid(100.0 * z)
            sig_ref[l] = sig
            h = jax.nn.softplus(100.0 * z) * 0.01

        w_out = W_ref[L - 1, :HID, 0]                    # [256]
        raw = (h * w_out[None, :]).sum(axis=1) + b_ref[0, (L - 1) * HID]
        out_ref[:, 0] = raw

        # reverse v-chain: v_l = d raw / d h_l, down to the pe level
        v = jnp.broadcast_to(w_out[None, :], h.shape)    # [TM, 256]
        vpe = jnp.zeros_like(pe)
        for l in range(n_hidden - 1, -1, -1):
            vs = v * sig_ref[l]
            if l == cat_idx:
                vpe = vpe + _dot_t(vs, W_ref[l, HID:, :])
            v = _dot_t(vs, W_ref[l, :HID, :])
        vpe = vpe + v                                    # layer-0 input = pe
        # contract with the PE tangents in-kernel: graw_k = <tan_k, vpe>
        out_ref[:, 1] = (t0_ref[:] * vpe).sum(axis=1)
        out_ref[:, 2] = (t1_ref[:] * vpe).sum(axis=1)
        out_ref[:, 3] = (t2_ref[:] * vpe).sum(axis=1)

    return kernel


def make_pallas_reverse_fused(model: SDFModel, n_blocks: int,
                              interpret: bool = False):
    """custom_vjp op (params, pe [N,E], tan [3,N,E]) -> (raw, graw) with a
    Pallas primal and the jnp hand-derived backward."""
    assert model.hidden_size == HID, "pallas kernel assumes hidden=256"
    E = model.embedding_size
    assert E <= HID
    cat_idx = 1 + n_blocks
    L = 2 * n_blocks + 3
    # Mosaic supports only DEFAULT/HIGHEST dot precision; "high" promotes
    # to HIGHEST inside the kernel (more accurate, still fast in VMEM)
    prec = (jax.lax.Precision.DEFAULT if model.mm_precision == "default"
            else jax.lax.Precision.HIGHEST)
    jnp_op = make_reverse_fused_mlp(model, n_blocks)  # supplies the bwd
    kernel = _make_kernel(L, cat_idx, E, prec)
    TM = 256

    # rows per pallas invocation: keeps each call's output block small
    # enough that XLA's VMEM-resident placement of loop-body outputs stays
    # under the 16 MB scoped limit
    CHUNK = 28 * TM

    def _primal(params, pe, tan):
        N = pe.shape[0]
        Np = ((N + CHUNK - 1) // CHUNK) * CHUNK
        n_chunks = Np // CHUNK
        pe_pad = jnp.zeros((Np, HID), jnp.float32).at[:N, :E].set(pe)
        tans = [jnp.zeros((Np, HID), jnp.float32).at[:N, :E].set(tan[k])
                for k in range(3)]
        Wp, bp = _pack_params(params)

        tile = pl.BlockSpec((TM, HID), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(CHUNK // TM,),
            in_specs=[
                tile, tile, tile, tile,
                pl.BlockSpec((L, CAT, HID), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, L * HID), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CHUNK, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((L - 1, TM, HID), jnp.float32)],
            interpret=interpret,
        )

        def one_chunk(args):
            pe_c, t0, t1, t2 = args
            return call(pe_c, t0, t1, t2, Wp, bp)

        chunked = tuple(a.reshape(n_chunks, CHUNK, HID)
                        for a in (pe_pad, *tans))
        out = jax.lax.map(one_chunk, chunked).reshape(Np, 128)

        raw = out[:N, 0]
        graw = out[:N, 1:4]
        return raw, graw

    @jax.custom_vjp
    def fused(params, pe, tan):
        return _primal(params, pe, tan)

    def fwd(params, pe, tan):
        return _primal(params, pe, tan), (params, pe, tan)

    def bwd(saved, cot):
        # reuse the validated jnp backward of the reverse-form op
        _, jnp_vjp = jax.vjp(jnp_op, *saved)
        return jnp_vjp(cot)

    fused.defvjp(fwd, bwd)
    return fused
