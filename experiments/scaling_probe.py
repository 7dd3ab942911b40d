#!/usr/bin/env python
"""Why does ns/point regress at 4x rays? (VERDICT round-3 weak #1)

BENCH_r03: 58.59 ns/pt at 1x, 57.27 at 2x, 62.62 at 4x. This probe
splits the full step into kernel vs XLA-glue at each multiplier, and
separately measures the kernel with the pc-bounds section disabled —
the batch-distance scores are [N, R_surf] = [27k*m, 1k*m]: the ONLY
step component whose work grows QUADRATICALLY with the ray multiplier
(everything else is linear in m).

Measurement per docs/PERF.md: 600-step scanned bundles, value-fetch
sync, min of 6 repetitions.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
from isdf_tpu.engine.trainer import Trainer
from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.pallas_mlp import make_pallas_train_op
from isdf_tpu.utils.config import Config

BUNDLE = 600


def full_step_ms(cfg, ds, mult):
    tr = Trainer(cfg.replace(n_rays=mult * cfg.n_rays), dataset=ds, seed=1)
    for fid in np.linspace(0, 360, 8, dtype=int):
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([int(fid)])[0])
    tr._ensure_compiled(BUNDLE)
    tr._timed_throwaway_bundle(BUNDLE)
    walls = [tr._timed_throwaway_bundle(BUNDLE) for _ in range(6)]
    return max(float(np.min(walls)) - tr._sync_overhead_s, 1e-4) \
        / BUNDLE * 1e3


def kernel_only_ms(cfg, mult, pc_bounds=True):
    model = M.SDFModel(embedding_size=cfg.embedding_size,
                       hidden_size=cfg.hidden_feature_size,
                       hidden_layers_block=cfg.hidden_layers_block,
                       max_deg=cfg.n_embed_funcs,
                       scale_input=cfg.scale_input,
                       scale_output=cfg.scale_output,
                       mm_precision=cfg.mm_precision)
    params = M.init_params(jax.random.PRNGKey(0), model)
    op = make_pallas_train_op(
        model, cfg.hidden_layers_block, loss_type=cfg.loss_type,
        trunc_distance=cfg.trunc_distance, trunc_weight=cfg.trunc_weight,
        eik_apply_dist=cfg.eik_apply_dist, eik_weight=cfg.eik_weight,
        grad_weight=cfg.grad_weight, orien_loss=cfg.orien_loss,
        pe_in_kernel=True, pc_bounds=pc_bounds)

    R = mult * cfg.window_size * cfg.n_rays
    S = cfg.n_samples_per_ray
    N = R * S
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (N, 3), minval=-2.0, maxval=2.0)
    surf = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0)
    surf_valid = jnp.ones((R,))
    zd = jax.random.uniform(key, (N,), minval=-0.5, maxval=0.5)
    normals_pt = jnp.zeros((N, 3)).at[:, 1].set(1.0)
    is_surf = jnp.zeros((N,)).at[::S].set(1.0)
    valid = jnp.ones((N,))
    noise = jnp.zeros((N,))
    transform = jnp.eye(4)

    @jax.jit
    def bundle(params, pts):
        def body(c, _):
            if pc_bounds:
                sums, ploss, grads = op(
                    params, transform, pts, surf, surf_valid, zd,
                    normals_pt, is_surf, valid, noise,
                    jnp.float32(1.0 / N))
            else:
                # bounds precomputed outside the kernel (the non-pc
                # signature): same MLP/loss/VJP work, no pc section
                sums, ploss, grads = op(
                    params, transform, pts, zd, valid, noise,
                    normals_pt, jnp.float32(1.0 / N))
            s = sums[0] + sum(jnp.sum(g)
                              for g in jax.tree_util.tree_leaves(grads))
            return c + s, ()
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=BUNDLE)
        return out

    float(np.asarray(bundle(params, pts)))  # warm
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(np.asarray(bundle(params, pts)))
        walls.append(time.perf_counter() - t0)
    return min(walls) / BUNDLE * 1e3


def main():
    cfg = Config().replace(dataset_format="synthetic", bounds_method="pc")
    scene = SyntheticScene(extents=(6.0, 3.0, 4.5))
    ds = SyntheticDataset(scene, n_frames=400, H=680, W=1200,
                          orbit_radius=1.6)
    base_pts = cfg.window_size * cfg.n_rays * cfg.n_samples_per_ray
    out = {}
    for m in (1, 2, 4):
        full = full_step_ms(cfg, ds, m)
        kern = kernel_only_ms(cfg, m, pc_bounds=True)
        kern_nopc = kernel_only_ms(cfg, m, pc_bounds=False)
        n = m * base_pts
        out[f"{m}x"] = {
            "full_ms": round(full, 3),
            "kernel_ms": round(kern, 3),
            "kernel_nopc_ms": round(kern_nopc, 3),
            "glue_ms": round(full - kern, 3),
            "pc_section_ms": round(kern - kern_nopc, 3),
            "full_ns_per_pt": round(1e6 * full / n, 2),
            "kernel_ns_per_pt": round(1e6 * kern / n, 2),
            "kernel_nopc_ns_per_pt": round(1e6 * kern_nopc / n, 2),
        }
        print(json.dumps({m: out[f"{m}x"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
