"""pc_surf_budget: the batch-distance surface-set cap (the fix for the
4x-rays ns/point regression — experiments/scaling_probe.py showed the
[N, R_surf] score matrix is the step's only quadratic term).

Semantics under test:
  * budget >= surface count -> bit-identical to the uncapped bound;
  * valid-first selection: when the VALID surface points fit the budget,
    the bound is exact even though invalid rows were dropped;
  * budget < valid count -> the bound is a subset-min: same sign, and
    |b_budget| >= |b_full| pointwise;
  * the full train step (pallas interpret kernel and XLA path) runs and
    decreases the loss with a budget active.
"""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import bounds as B
from isdf_tpu.ops import geometry as G
from isdf_tpu.utils.config import Config


def _ray_batch(key, R=64, S=5):
    ks = jax.random.split(key, 3)
    pc = jax.random.uniform(ks[0], (R, S, 3), minval=-2.0, maxval=2.0)
    z = jnp.sort(jax.random.uniform(ks[1], (R, S), minval=0.2,
                                    maxval=3.0), axis=1)
    depth = z[:, 0] + 0.1
    return pc, z, depth


def _budget_sel(key, pc, valid, budget):
    # the engine's selection rule (engine/step.py _surf_set)
    R = pc.shape[0]
    score = (valid.astype(jnp.float32) * 2.0
             + jax.random.uniform(jax.random.fold_in(key, 7), (R,)))
    sel = jax.lax.top_k(score, budget)[1]
    return pc[:, 0][sel], valid[sel]


def test_budget_all_valid_fit_is_exact():
    key = jax.random.PRNGKey(0)
    pc, z, depth = _ray_batch(key)
    valid = jnp.arange(64) < 20  # only 20 valid rays
    full = B.bounds_pc(pc, z, depth, valid, do_grad=True)
    surf, sv = _budget_sel(key, pc, valid, budget=32)
    assert int(sv.sum()) == 20  # valid-first: every valid point kept
    capped = B.bounds_pc(pc, z, depth, valid, do_grad=True,
                         surf=surf, surf_valid=sv)
    np.testing.assert_allclose(np.asarray(capped.bounds),
                               np.asarray(full.bounds), atol=1e-6)
    np.testing.assert_allclose(np.asarray(capped.grad),
                               np.asarray(full.grad), atol=1e-6)


def test_budget_is_subset_min():
    key = jax.random.PRNGKey(1)
    pc, z, depth = _ray_batch(key, R=128)
    valid = jnp.ones(128, bool)
    full = B.bounds_pc(pc, z, depth, valid, do_grad=False)
    surf, sv = _budget_sel(key, pc, valid, budget=48)
    capped = B.bounds_pc(pc, z, depth, valid, do_grad=False,
                         surf=surf, surf_valid=sv)
    bf = np.asarray(full.bounds)
    bc = np.asarray(capped.bounds)
    # sign comes from z vs depth (identical); exact-surface samples have
    # dist 0 in the full set (their own surf point) -> sign 0 there
    nz = bf != 0
    assert (np.sign(bc)[nz] == np.sign(bf)[nz]).all()
    assert (np.abs(bc) >= np.abs(bf) - 1e-6).all()  # min over a subset


def test_train_step_with_budget_runs_and_learns():
    """End-to-end through build_step_functions at both executors with
    the budget ACTIVE (budget < window*rays)."""
    from isdf_tpu.engine import buffer as BUF
    from isdf_tpu.engine.step import build_step_functions
    from isdf_tpu.models import sdf_mlp as M

    H, W = 16, 24
    for grad_mode, interp in (("pallas", True), ("auto", False)):
        cfg = Config().replace(
            n_rays=16, n_strat_samples=5, n_surf_samples=3,
            kf_buffer_size=8, bounds_method="pc", grad_mode=grad_mode,
            pallas_interpret=interp, pc_surf_budget=40)  # < 80 rays
        model = M.SDFModel(embedding_size=cfg.embedding_size,
                           scale_input=cfg.scale_input)
        dirs_C = G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2)
        params = M.init_params(jax.random.PRNGKey(0), model)
        buf = BUF.make_buffer(8, H, W, with_normals=cfg.do_normal)
        depth = jnp.full((H, W), 2.0)
        normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
        buf = BUF.add_frame(buf, depth, jnp.eye(4), normals, 0,
                            replace=False)
        fns = build_step_functions(cfg, model, H, W, dirs_C)
        p, _, _, s = fns.train_bundle(
            params, fns.optimiser.init(params), buf, fns.dirs,
            jnp.eye(4), jax.random.PRNGKey(5), jnp.float32(0.0),
            n_steps=8)
        tl = np.asarray(s["total_loss"])
        assert np.isfinite(tl).all(), grad_mode
        assert tl[-1] < tl[0], (grad_mode, tl)


def test_budget_inactive_at_shipped_workload():
    """Every shipped config's surface count <= the default budget, so
    the production 1x step is the exact uncapped math."""
    import glob
    import json
    import os
    for p in glob.glob(os.path.join("isdf_tpu", "train", "configs",
                                    "*.json")):
        c = json.load(open(p))
        n_rays = c.get("sample", {}).get("n_rays", 200)
        win = c.get("model", {}).get("window_size", 5)
        budget = c.get("tpu", {}).get("pc_surf_budget", 1000)
        assert win * n_rays <= budget, p
