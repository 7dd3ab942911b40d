#!/usr/bin/env python
"""Is an in-kernel AdamW epilogue / in-kernel noise RNG worth it?
(VERDICT round-3 item 7; ROADMAP round-4 items 1/3. Keep-bar: >= 40
us/step.)

Measures the STANDALONE scanned cost of the two glue pieces the kernel
could absorb — an upper bound on what folding them in could save
(inside the real step they overlap with kernel execution, so the
realised saving would be smaller):

  * adamw: optax.adamw update+apply on the packed parameter planes
    (Wp [L,512,256] + bpt [8,(L+1)*256]) with fixed gradients;
  * noise: jax.random.normal over the step's 27k points.

600-step scanned bundles, value-fetch sync, min of 6 (docs/PERF.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.pallas_mlp import pack_params_train
from isdf_tpu.utils.config import Config

BUNDLE = 600


def timed(bundle_fn, *args):
    float(np.asarray(jax.tree_util.tree_leaves(bundle_fn(*args))[0]
                     ).reshape(-1)[0])  # warm + fetch
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(np.asarray(jax.tree_util.tree_leaves(bundle_fn(*args))[0]
                         ).reshape(-1)[0])
        walls.append(time.perf_counter() - t0)
    return min(walls) / BUNDLE * 1e3


def main():
    cfg = Config()
    model = M.SDFModel(embedding_size=cfg.embedding_size,
                       hidden_size=cfg.hidden_feature_size,
                       hidden_layers_block=cfg.hidden_layers_block,
                       max_deg=cfg.n_embed_funcs,
                       scale_input=cfg.scale_input,
                       scale_output=cfg.scale_output)
    params = M.init_params(jax.random.PRNGKey(0), model)
    packed = pack_params_train(params)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(packed))
    opt = optax.adamw(learning_rate=cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
                      weight_decay=cfg.weight_decay)
    opt_state = opt.init(packed)
    grads = jax.tree_util.tree_map(lambda x: 0.001 * jnp.ones_like(x),
                                   packed)

    @jax.jit
    def adamw_bundle(p, s):
        def body(c, _):
            p, s = c
            u, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, u)
            return (p, s), ()
        (p, s), _ = jax.lax.scan(body, (p, s), None, length=BUNDLE)
        return p

    N = cfg.window_size * cfg.n_rays * cfg.n_samples_per_ray

    @jax.jit
    def noise_bundle(key):
        def body(c, k):
            return c + jax.random.normal(k, (N,)).sum(), ()
        keys = jax.random.split(key, BUNDLE)
        out, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return out

    from isdf_tpu.models.fused_adamw import make_fused_adamw
    fused = make_fused_adamw(cfg.lr, cfg.weight_decay)

    @jax.jit
    def fused_bundle(p, s):
        def body(c, _):
            p, s = c
            p, s = fused(p, grads, s, 1.0)
            return (p, s), ()
        (p, s), _ = jax.lax.scan(body, (p, s), None, length=BUNDLE)
        return p

    ms_adamw = timed(adamw_bundle, packed, opt_state)
    ms_fused = timed(fused_bundle, packed, opt.init(packed))
    ms_noise = timed(noise_bundle, jax.random.PRNGKey(3))
    print(f"fused adamw (models/fused_adamw.py): "
          f"{1e3 * ms_fused:.1f} us/step")
    print(f"packed params: {n_params} elements")
    print(f"adamw epilogue (standalone): {1e3 * ms_adamw:.1f} us/step")
    print(f"noise RNG 27k (standalone):  {1e3 * ms_noise:.1f} us/step")
    bar = 40.0
    for name, us in (("adamw", 1e3 * ms_adamw), ("noise", 1e3 * ms_noise)):
        verdict = "ABOVE" if us >= bar else "below"
        print(f"{name}: {us:.1f} us/step -> {verdict} the 40 us keep-bar "
              "(standalone upper bound; in-step overlap makes the real "
              "saving smaller)")


if __name__ == "__main__":
    main()
