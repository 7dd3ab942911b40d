"""fused_adamw == optax.adamw, element-exact, on optax's own state."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isdf_tpu.models.fused_adamw import make_fused_adamw

LR, WD = 0.0013, 0.012


def _tree(key):
    ks = jax.random.split(key, 3)
    return {"W": jax.random.normal(ks[0], (7, 32, 16)),
            "b": jax.random.normal(ks[1], (8, 48)),
            "zeros": jnp.zeros((4, 4))}  # padded-plane rows stay zero


def test_matches_optax_over_steps_with_lr_scale():
    opt = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD)
    fused = make_fused_adamw(LR, WD)

    p_ref = _tree(jax.random.PRNGKey(0))
    p_fused = jax.tree_util.tree_map(jnp.copy, p_ref)
    s_ref = opt.init(p_ref)
    s_fused = opt.init(p_fused)

    for i in range(5):
        g = _tree(jax.random.PRNGKey(100 + i))
        g["zeros"] = jnp.zeros((4, 4))  # zero grad -> zero update
        lr_scale = [1.0, 0.5, 1.0, 0.25, 0.8][i]
        u, s_ref = opt.update(g, s_ref, p_ref)
        u = jax.tree_util.tree_map(lambda x: x * lr_scale, u)
        p_ref = optax.apply_updates(p_ref, u)
        p_fused, s_fused = fused(p_fused, g, s_fused, lr_scale)

    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-7)
    # state pytree identical in structure and values
    assert (jax.tree_util.tree_structure(s_ref)
            == jax.tree_util.tree_structure(s_fused))
    assert int(s_fused[0].count) == 5
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-7)
    # the all-zero-grad leaf never moves (packed-padding invariant)
    assert float(jnp.abs(p_fused["zeros"]).max()) == 0.0


def test_engine_bundle_matches_previous_optax_semantics():
    """A train bundle with the fused update reproduces optax applied
    manually to the same grads (tiny model, 1 step, CPU)."""
    from isdf_tpu.engine import buffer as BUF
    from isdf_tpu.engine.step import build_step_functions
    from isdf_tpu.models import sdf_mlp as M
    from isdf_tpu.ops import geometry as G
    from isdf_tpu.utils.config import Config

    H, W = 16, 24
    cfg = Config().replace(
        n_rays=8, n_strat_samples=5, n_surf_samples=3, kf_buffer_size=4,
        hidden_feature_size=32, hidden_layers_block=1, n_embed_funcs=3,
        grad_mode="auto")
    model = M.SDFModel(embedding_size=cfg.embedding_size,
                       hidden_size=32, hidden_layers_block=1,
                       max_deg=3, scale_input=cfg.scale_input)
    dirs_C = G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2)
    params = M.init_params(jax.random.PRNGKey(0), model)
    buf = BUF.make_buffer(4, H, W, with_normals=cfg.do_normal)
    depth = jnp.full((H, W), 2.0)
    normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    buf = BUF.add_frame(buf, depth, jnp.eye(4), normals, 0, replace=False)
    fns = build_step_functions(cfg, model, H, W, dirs_C)
    p, o, _, s = fns.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns.optimiser.init(params), buf, fns.dirs, jnp.eye(4),
        jax.random.PRNGKey(5), jnp.float32(0.0), n_steps=3)
    assert np.isfinite(np.asarray(s["total_loss"])).all()
    assert int(o[0].count) == 3
    moved = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree_util.tree_leaves(p),
                 jax.tree_util.tree_leaves(params))]
    assert max(moved) > 0
