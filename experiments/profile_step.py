#!/usr/bin/env python
"""Ablation profile of the fused train step: where do the ms go?

Variants (each a 600-step scanned bundle, timed by value-fetch like
bench.py — see docs/PERF.md measurement methodology):
  full          — the shipped default step (reverse_fused, ray bounds)
  no_gradlosses — eik_weight=grad_weight=0 (no spatial grads: fwd+bwd only)
  mlp_only      — value_and_grad of the reverse_fused op on a FIXED pc
                  + AdamW (no sampling/bounds/losses/frame_avg)
  mlp_fwdbwd    — plain apply value_and_grad on fixed pc + AdamW
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
from isdf_tpu.engine.trainer import Trainer
from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.fused_vjp import make_reverse_fused_mlp
from isdf_tpu.models.sdf_mlp import _pe_factored
from isdf_tpu.utils.config import Config

BUNDLE = 600


def timed(fn, fetch, reps=3):
    fetch(fn())  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts)) / BUNDLE


def trainer_variant(cfg):
    scene = SyntheticScene(extents=(6.0, 3.0, 4.5))
    ds = SyntheticDataset(scene, n_frames=400, H=680, W=1200,
                          orbit_radius=1.6)
    tr = Trainer(cfg, dataset=ds, seed=1)
    for fid in np.linspace(0, 360, 8, dtype=int):
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([int(fid)])[0])
    tr._ensure_compiled(BUNDLE)

    def run():
        return tr.run_steps(BUNDLE)
    # run_steps already fetches scalars
    return timed(run, lambda x: x)


def mlp_variant(mode):
    from isdf_tpu.models.pallas_mlp import make_pallas_reverse_fused
    cfg = Config()
    model = M.SDFModel(mm_precision=cfg.mm_precision)
    key = jax.random.PRNGKey(0)
    params = M.init_params(key, model)
    opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = opt.init(params)
    N = cfg.window_size * cfg.n_rays * cfg.n_samples_per_ray
    pc = jax.random.uniform(key, (N, 3), minval=-2.0, maxval=2.0)
    transform = jnp.eye(4)
    op = (make_pallas_reverse_fused(model, cfg.hidden_layers_block)
          if mode == "pallas"
          else make_reverse_fused_mlp(model, cfg.hidden_layers_block))

    def loss_fused(p):
        pe, cos_b, dxs, dproj2 = _pe_factored(pc, model, transform)
        raw, graw = op(p, pe, cos_b, dxs, dproj2)
        eik = jnp.abs(jnp.linalg.norm(graw, axis=-1) - 1.0).mean()
        return jnp.abs(raw).mean() + 0.3 * eik

    def loss_plain(p):
        sdf = M.apply(p, pc, model)
        return jnp.abs(sdf).mean()

    loss_fn = loss_plain if mode == "plain" else loss_fused

    @jax.jit
    def bundle(params, opt_state):
        def body(c, _):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(g, o, p)
            return (optax.apply_updates(p, up), o), l
        (params, opt_state), ls = jax.lax.scan(
            body, (params, opt_state), None, length=BUNDLE)
        return params, opt_state, ls

    state = [params, opt_state]

    def run():
        p, o, ls = bundle(state[0], state[1])
        state[0], state[1] = p, o
        return ls

    return timed(run, lambda ls: np.asarray(ls[-1]))


def main():
    import sys as _sys
    which = _sys.argv[1:] or ["mlp_fwdbwd", "mlp_fused", "mlp_pallas",
                              "full", "full_pallas", "no_gradlosses"]
    res = {}
    if "mlp_fwdbwd" in which:
        res["mlp_fwdbwd"] = mlp_variant("plain")
    if "mlp_fused" in which:
        res["mlp_only(fused rf)"] = mlp_variant("fused")
    if "mlp_pallas" in which:
        res["mlp_only(pallas)"] = mlp_variant("pallas")
    if "full" in which:
        res["full(default)"] = trainer_variant(
            Config().replace(dataset_format="synthetic"))
    if "full_pallas" in which:
        res["full(pallas)"] = trainer_variant(
            Config().replace(dataset_format="synthetic",
                             grad_mode="pallas"))
    if "no_gradlosses" in which:
        res["no_gradlosses"] = trainer_variant(
            Config().replace(dataset_format="synthetic",
                             eik_weight=0.0, grad_weight=0.0))
    for k, v in res.items():
        print(f"{k:24s} {v:7.3f} ms/step  ({1000.0/v:6.1f} steps/s)")


if __name__ == "__main__":
    main()
