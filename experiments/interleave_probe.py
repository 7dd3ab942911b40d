#!/usr/bin/env python
"""Probe: does two-stream interleaving hide VPU time under the MXU?

docs/PERF.md attributes the ~0.4 ms gap between the train kernel's
measured time and its FLOP content to the MXU<->VPU dependency chain of
the per-layer pattern (dot -> softplus/sigmoid -> dot ...): within one
row tile every dot waits on the previous layer's VPU math. Row tiles are
mutually independent, so issuing TWO tiles' instruction streams
round-robin per layer should let tile B's matmul occupy the MXU while
tile A's transcendentals run on the VPU (in-order issue stalls only on
operand dependencies).

This measures the minimal version of that: the forward stack alone
(6 chained [TM,256]x[256,256] dots + shared-exp sigmoid/softplus),
same total rows, three executions:

  single   — grid of N/TM tiles, one [TM,.] stream per grid step
  paired   — grid of N/(2TM) tiles, two independent [TM,.] streams per
             grid step, program order interleaved per layer
  fat      — grid of N/(2TM) tiles, ONE [2TM,.] stream (the TM-sweep
             baseline shape: more rows per dot but the same chain)

If paired ~= single and fat, the stall theory is wrong (or Mosaic
serialises MXU/VPU anyway) and the production kernel stays as is.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HID = 256
L = 7           # layers incl. head; n_hidden = 6 chained dots
NH = L - 1
TM = 512
N = TM * 52     # ~27k rows, divisible by 2*TM
BUNDLE = 600


def _sig_sp(z):
    x = 100.0 * z
    e = jnp.exp(-jnp.abs(x))
    inv1pe = 1.0 / (1.0 + e)
    sig = jnp.where(x >= 0, inv1pe, e * inv1pe)
    h = (jnp.maximum(x, 0.0) + jnp.log1p(e)) * 0.01
    return sig, h


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def kernel_single(x_ref, W_ref, o_ref):
    h = x_ref[:]
    for l in range(NH):
        z = _dot(h, W_ref[l])
        _, h = _sig_sp(z)
    o_ref[:] = h


def kernel_paired(x_ref, W_ref, o_ref):
    ha = x_ref[0:TM]
    hb = x_ref[TM:]
    for l in range(NH):
        za = _dot(ha, W_ref[l])
        zb = _dot(hb, W_ref[l])
        _, ha = _sig_sp(za)
        _, hb = _sig_sp(zb)
    o_ref[0:TM] = ha
    o_ref[TM:] = hb


def kernel_fat(x_ref, W_ref, o_ref):
    h = x_ref[:]
    for l in range(NH):
        z = _dot(h, W_ref[l])
        _, h = _sig_sp(z)
    o_ref[:] = h


def build(kern, tile_rows):
    grid = N // tile_rows
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, HID), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NH, HID, HID), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, HID), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, HID), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("arbitrary",)),
    )


def timeit(op, x, W):
    # feed the output back as the next input: without a loop-carried
    # dependency XLA hoists the (pure) kernel custom-call out of the
    # scan and the "bundle" runs the kernel once (first probe version
    # measured 2x the chip's bf16 peak — impossible — for this reason)
    @jax.jit
    def bundle(x, W):
        def body(h, _):
            o = op(h, W)
            return o * 0.01, ()
        out, _ = jax.lax.scan(body, x, None, length=BUNDLE)
        return out[0, 0]

    float(np.asarray(bundle(x, W)))  # warm
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(np.asarray(bundle(x, W)))
        walls.append(time.perf_counter() - t0)
    return min(walls) / BUNDLE * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, HID), jnp.float32) * 0.05
    W = jax.random.normal(key, (NH, HID, HID), jnp.float32) * 0.05

    flops = BUNDLE and 2 * N * HID * HID * NH        # per step
    res = {}
    for name, kern, rows in [("single", kernel_single, TM),
                             ("paired", kernel_paired, 2 * TM),
                             ("fat", kernel_fat, 2 * TM)]:
        ms = timeit(build(kern, rows), x, W)
        res[name] = ms
        print(f"{name:8s} {ms:.3f} ms/step   "
              f"{flops / (ms * 1e-3) / 1e12:.1f} TFLOP/s")
    print(f"paired vs single: {res['single'] / res['paired']:.3f}x")


if __name__ == "__main__":
    main()
