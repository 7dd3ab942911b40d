"""Multi-chip data parallelism on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.engine import buffer as BUF
from isdf_tpu.engine.step import build_step_functions
from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.ops import geometry as G
from isdf_tpu.parallel.mesh import make_mesh, replicated
from isdf_tpu.utils.config import Config


def _setup(mesh=None, n_rays=32):
    cfg = Config().replace(
        n_rays=n_rays, n_strat_samples=5, n_surf_samples=3,
        hidden_feature_size=32, hidden_layers_block=1, n_embed_funcs=3,
        kf_buffer_size=8, bounds_method="pc")
    H, W = 16, 24
    model = M.SDFModel(embedding_size=cfg.embedding_size, hidden_size=32,
                       hidden_layers_block=1, scale_input=cfg.scale_input,
                       max_deg=3)
    dirs_C = G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2)
    fns = build_step_functions(cfg, model, H, W, dirs_C, mesh=mesh)
    params = M.init_params(jax.random.PRNGKey(0), model)
    opt = fns.optimiser.init(params)
    buf = BUF.make_buffer(8, H, W, with_normals=cfg.do_normal)
    depth = jnp.full((H, W), 2.0)
    normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    for i in range(3):
        T = jnp.eye(4).at[0, 3].set(0.05 * i)
        buf = BUF.add_frame(buf, depth, T, normals, i, replace=False)
    return cfg, fns, params, opt, buf


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_bundle_matches_single_device():
    mesh = make_mesh(8)
    # window_size * n_rays = 5 * 32 = 160 rays, divisible by 8
    cfg, fns1, params, opt, buf = _setup(mesh=None)
    _, fns8, _, _, _ = _setup(mesh=mesh)

    key = jax.random.PRNGKey(3)
    p1, o1, b1, s1 = fns1.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns1.optimiser.init(params),
        jax.tree_util.tree_map(jnp.copy, buf), fns1.dirs, jnp.eye(4), key,
        jnp.float32(0.0), n_steps=4)

    rep = replicated(mesh)
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), t)
    p8, o8, b8, s8 = fns8.train_bundle(
        put(params), put(fns8.optimiser.init(params)), put(buf),
        jax.device_put(fns8.dirs, rep), jax.device_put(jnp.eye(4), rep),
        key, jnp.float32(0.0), n_steps=4)

    # identical RNG + replicated state => identical losses (fp tolerance)
    np.testing.assert_allclose(np.asarray(s1["total_loss"]),
                               np.asarray(s8["total_loss"]),
                               rtol=2e-4, atol=1e-5)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p8)
    assert max(jax.tree_util.tree_leaves(d)) < 5e-5


@pytest.mark.parametrize("bounds_method", ["ray", "pc"])
def test_sharded_pallas_train_kernel_matches_single_device(bounds_method):
    """The monolithic Pallas train kernel under shard_map (each device
    runs its ray shard, dW/scalars psummed over "dp") == single-device
    kernel, for streamed ray bounds AND in-kernel batch-distance bounds
    (surf set replicated). Interpret mode; requires pe_in_kernel."""
    mesh = make_mesh(8)
    cfg = Config().replace(
        n_rays=16, n_strat_samples=5, n_surf_samples=3,
        kf_buffer_size=8, bounds_method=bounds_method, grad_mode="pallas",
        pallas_interpret=True)  # pe_in_kernel/pc_in_kernel default True
    H, W = 16, 24
    model = M.SDFModel(embedding_size=cfg.embedding_size,
                       scale_input=cfg.scale_input)
    dirs_C = G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2)
    params = M.init_params(jax.random.PRNGKey(0), model)
    buf = BUF.make_buffer(8, H, W, with_normals=cfg.do_normal)
    depth = jnp.full((H, W), 2.0)
    normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    buf = BUF.add_frame(buf, depth, jnp.eye(4), normals, 0, replace=False)

    fns1 = build_step_functions(cfg, model, H, W, dirs_C, mesh=None)
    fns8 = build_step_functions(cfg, model, H, W, dirs_C, mesh=mesh)
    key = jax.random.PRNGKey(5)
    p1, _, _, s1 = fns1.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns1.optimiser.init(params),
        jax.tree_util.tree_map(jnp.copy, buf), fns1.dirs, jnp.eye(4), key,
        jnp.float32(0.0), n_steps=2)

    rep = replicated(mesh)
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), t)
    p8, _, _, s8 = fns8.train_bundle(
        put(params), put(fns8.optimiser.init(params)), put(buf),
        jax.device_put(fns8.dirs, rep), jax.device_put(jnp.eye(4), rep),
        key, jnp.float32(0.0), n_steps=2)

    np.testing.assert_allclose(np.asarray(s1["total_loss"]),
                               np.asarray(s8["total_loss"]),
                               rtol=2e-4, atol=1e-5)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p8)
    assert max(jax.tree_util.tree_leaves(d)) < 5e-5


def test_trainer_data_parallel_config_matches_single_device():
    """tpu.data_parallel in the config wires the mesh end-to-end through
    Trainer (VERDICT r1 item 3): same seeds => same losses as 1-device."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    base = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=8)

    losses = []
    for dp in (1, 8):
        ds = SyntheticDataset(SyntheticScene(), n_frames=10, H=24, W=32)
        tr = Trainer(base.replace(data_parallel=dp), dataset=ds, seed=3)
        assert (tr.mesh is None) == (dp == 1)
        for i in range(2):
            tr.last_is_keyframe = True
            tr.add_frame(tr.get_data([i])[0])
        s = tr.run_steps(3)
        losses.append(np.asarray(s["total_loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4, atol=1e-5)


def test_trainer_data_parallel_rejects_bad_ray_count():
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=15, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, data_parallel=8)  # 75 rays % 8 != 0
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    with pytest.raises(ValueError, match="divide"):
        Trainer(cfg, dataset=ds, seed=0)


def test_dryrun_multichip_entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (27000,)
    assert np.isfinite(np.asarray(out)).all()
