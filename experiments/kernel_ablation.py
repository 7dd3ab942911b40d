#!/usr/bin/env python
"""Section-ablation timing of the monolithic train kernel.

Each variant recompiles the kernel with a section statically removed or
re-routed, on the SAME 27k-point workload, timed like
kernel_only_bench.py (600-step scan bundle, min-of-6 value-fetch walls).
Differences between variants bound what each section costs — the only
way to split the kernel internals on this backend (the axon trace has no
intra-custom-call events, see docs/PERF.md).

Usage: python experiments/kernel_ablation.py [variant ...]
Variants:
  full     — shipped pc_in_kernel config (baseline)
  nopc     — pc section removed (bounds + grad targets streamed in aux)
  eikonly  — grad_weight=0: no gradient-cosine loss section
  noeik    — eik_weight=0: no eikonal section
  orien    — orien_loss: grad-cosine has zero backward
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.pallas_mlp import make_pallas_train_op
from isdf_tpu.utils.config import Config

BUNDLE = 600

VARIANTS = {
    "full": {},
    "nopc": {"pc": False},
    "eikonly": {"grad_weight": 0.0},
    "noeik": {"eik_weight": 0.0},
    "orien": {"orien_loss": True},
}


def run(name):
    spec = VARIANTS[name]
    cfg = Config().replace(bounds_method="pc")
    model = M.SDFModel(embedding_size=cfg.embedding_size,
                       hidden_size=cfg.hidden_feature_size,
                       hidden_layers_block=cfg.hidden_layers_block,
                       max_deg=cfg.n_embed_funcs,
                       scale_input=cfg.scale_input,
                       scale_output=cfg.scale_output,
                       mm_precision=cfg.mm_precision)
    params = M.init_params(jax.random.PRNGKey(0), model)
    pc = spec.get("pc", True)
    op = make_pallas_train_op(
        model, cfg.hidden_layers_block, loss_type=cfg.loss_type,
        trunc_distance=cfg.trunc_distance, trunc_weight=cfg.trunc_weight,
        eik_apply_dist=cfg.eik_apply_dist,
        eik_weight=spec.get("eik_weight", cfg.eik_weight),
        grad_weight=spec.get("grad_weight", cfg.grad_weight),
        orien_loss=spec.get("orien_loss", cfg.orien_loss),
        pe_in_kernel=True, pc_bounds=pc)

    R = cfg.window_size * cfg.n_rays
    S = cfg.n_samples_per_ray
    N = R * S
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (N, 3), minval=-2.0, maxval=2.0)
    surf = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0)
    zd = jax.random.uniform(key, (N,), minval=-0.5, maxval=0.5)
    normals_pt = jnp.zeros((N, 3)).at[:, 1].set(1.0)
    is_surf = jnp.zeros((N,)).at[::S].set(1.0)
    valid = jnp.ones((N,))
    noise = jnp.zeros((N,))
    transform = jnp.eye(4)
    bounds = jax.random.uniform(key, (N,), minval=-0.3, maxval=1.0)
    gt = normals_pt

    @jax.jit
    def bundle(params, pts):
        def body(c, _):
            if pc:
                sums, ploss, grads = op(
                    params, transform, pts, surf, jnp.ones((R,)), zd,
                    normals_pt, is_surf, valid, noise,
                    jnp.float32(1.0 / N))
            else:
                sums, ploss, grads = op(
                    params, transform, pts, bounds, valid, noise, gt,
                    jnp.float32(1.0 / N))
            s = sums[0] + sum(jnp.sum(g)
                              for g in jax.tree_util.tree_leaves(grads))
            return c + s, ()
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=BUNDLE)
        return out

    float(np.asarray(bundle(params, pts)))  # compile + warm
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(np.asarray(bundle(params, pts)))
        walls.append(time.perf_counter() - t0)
    ms = min(walls) / BUNDLE * 1e3
    print(f"{name:10s} {ms:.3f} ms/step", flush=True)
    return ms


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run(n)


if __name__ == "__main__":
    main()
