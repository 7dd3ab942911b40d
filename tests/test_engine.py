import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.engine import buffer as BUF
from isdf_tpu.engine.step import select_window, build_step_functions
from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.ops import geometry as G
from isdf_tpu.utils.config import Config


def test_buffer_append_and_replace():
    buf = BUF.make_buffer(4, 8, 8, with_normals=False)
    d0 = jnp.full((8, 8), 1.0)
    d1 = jnp.full((8, 8), 2.0)
    T = jnp.eye(4)
    buf = BUF.add_frame(buf, d0, T, jnp.zeros((0,)), 0, replace=False)
    assert int(buf.count) == 1
    buf = BUF.add_frame(buf, d1, T, jnp.zeros((0,)), 5, replace=False)
    assert int(buf.count) == 2
    assert float(buf.depth[1, 0, 0]) == 2.0
    # replace newest
    d2 = jnp.full((8, 8), 3.0)
    buf = BUF.add_frame(buf, d2, T, jnp.zeros((0,)), 6, replace=True)
    assert int(buf.count) == 2
    assert float(buf.depth[1, 0, 0]) == 3.0
    assert int(buf.frame_id[1]) == 6
    assert float(buf.depth[0, 0, 0]) == 1.0


def test_select_window_small_count():
    losses = jnp.zeros(16)
    idxs, valid = select_window(jax.random.PRNGKey(0), jnp.int32(3),
                                losses, 5)
    assert np.array_equal(np.asarray(idxs), [0, 1, 2, 3, 4])
    assert np.array_equal(np.asarray(valid), [1, 1, 1, 0, 0])


def test_select_window_big_count():
    losses = jnp.asarray(
        [0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 0.0, 0.0] + [0.0] * 8)
    count = jnp.int32(8)
    seen = set()
    for s in range(50):
        idxs, valid = select_window(jax.random.PRNGKey(s), count, losses, 5)
        idxs = np.asarray(idxs)
        assert np.asarray(valid).all()
        # two newest always last
        assert idxs[-2] == 6 and idxs[-1] == 7
        # sampled from the older pool [0, 6), no replacement
        assert len(set(idxs[:3])) == 3
        assert all(0 <= i < 6 for i in idxs[:3])
        seen.update(idxs[:3].tolist())
    # zero-loss frames are (almost) never selected over 10x-loss frames:
    # pool has losses [0,10,0,10,10,0]; picks should concentrate on 1,3,4
    assert {1, 3, 4} <= seen


def test_select_window_tail_mode():
    """Refinement tail: the whole window is loss-proportional over ALL
    frames — the newest two are no longer forced (engine/step.py)."""
    losses = jnp.asarray(
        [10.0, 10.0, 10.0, 10.0, 10.0, 1e-9, 1e-9, 1e-9] + [0.0] * 8)
    count = jnp.int32(8)
    newest_forced = 0
    for s in range(50):
        idxs, valid = select_window(jax.random.PRNGKey(s), count, losses, 5,
                                    tail=jnp.bool_(True))
        idxs = np.asarray(idxs)
        assert np.asarray(valid).all()
        assert len(set(idxs.tolist())) == 5          # without replacement
        assert all(0 <= i < 8 for i in idxs)
        if 6 in idxs and 7 in idxs:
            newest_forced += 1
    # the near-zero-loss newest frames should almost never BOTH appear
    assert newest_forced < 10
    # tail=False keeps the streaming rule byte-identical
    i1, _ = select_window(jax.random.PRNGKey(3), count, losses, 5)
    i2, _ = select_window(jax.random.PRNGKey(3), count, losses, 5,
                          tail=jnp.bool_(False))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def _tiny_setup(bounds_method="ray", n_rays=32, do_grads=True):
    cfg = Config().replace(
        n_rays=n_rays, n_strat_samples=5, n_surf_samples=3,
        hidden_feature_size=32, hidden_layers_block=1, n_embed_funcs=3,
        kf_buffer_size=8, bounds_method=bounds_method,
        eik_weight=0.268 if do_grads else 0.0,
        grad_weight=0.018 if do_grads else 0.0,
        min_depth=0.07, max_depth=12.0)
    H, W = 16, 24
    model = M.SDFModel(
        embedding_size=cfg.embedding_size, hidden_size=32,
        hidden_layers_block=1, scale_output=cfg.scale_output,
        scale_input=cfg.scale_input, max_deg=3)
    dirs_C = G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2)
    fns = build_step_functions(cfg, model, H, W, dirs_C)
    params = M.init_params(jax.random.PRNGKey(0), model)
    opt_state = fns.optimiser.init(params)
    buf = BUF.make_buffer(cfg.kf_buffer_size, H, W,
                          with_normals=cfg.do_normal)
    # one wall at z=2 seen from origin
    depth = jnp.full((H, W), 2.0)
    normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    buf = BUF.add_frame(buf, depth, jnp.eye(4),
                        normals if cfg.do_normal else jnp.zeros((0,)),
                        0, replace=False)
    transform = jnp.eye(4)
    return cfg, model, fns, params, opt_state, buf, transform


@pytest.mark.parametrize("bounds_method", ["ray", "pc", "normal"])
def test_train_bundle_decreases_loss(bounds_method):
    cfg, model, fns, params, opt_state, buf, transform = _tiny_setup(
        bounds_method)
    key = jax.random.PRNGKey(1)
    p, o, b, s0 = fns.train_bundle(params, opt_state, buf, fns.dirs, transform,
                                   key, jnp.float32(0.0), n_steps=2)
    first = float(np.asarray(s0["total_loss"])[0])
    for i in range(6):
        key, k = jax.random.split(key)
        p, o, b, s = fns.train_bundle(p, o, b, fns.dirs, transform, k,
                                      jnp.float32(0.0), n_steps=10)
    last = float(np.asarray(s["total_loss"])[-1])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first
    # frame_avg_loss was written back for the only frame
    assert float(b.frame_avg_loss[0]) > 0


def test_bundle_lr_scale():
    """lr_scale=0 freezes params (optimiser state still advances);
    lr_scale=1 matches the default exactly."""
    cfg, model, fns, params, opt_state, buf, transform = _tiny_setup()
    key = jax.random.PRNGKey(5)
    cp = lambda x: jax.tree_util.tree_map(jnp.copy, x)
    p0, _, _, _ = fns.train_bundle(
        cp(params), fns.optimiser.init(params), cp(buf), fns.dirs,
        transform, key, jnp.float32(0.0), n_steps=2,
        lr_scale=jnp.float32(0.0), tail=jnp.bool_(False))
    same = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, params)
    assert max(jax.tree_util.tree_leaves(same)) == 0.0

    p1, _, _, s1 = fns.train_bundle(
        cp(params), fns.optimiser.init(params), cp(buf), fns.dirs,
        transform, key, jnp.float32(0.0), n_steps=2,
        lr_scale=jnp.float32(1.0), tail=jnp.bool_(False))
    pd, _, _, sd = fns.train_bundle(
        cp(params), fns.optimiser.init(params), cp(buf), fns.dirs,
        transform, key, jnp.float32(0.0), n_steps=2)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, pd)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_bundle_updates_params_and_is_deterministic():
    cfg, model, fns, params, opt_state, buf, transform = _tiny_setup()
    key = jax.random.PRNGKey(7)
    p1, _, _, s1 = fns.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns.optimiser.init(params),
        jax.tree_util.tree_map(jnp.copy, buf), fns.dirs, transform, key,
        jnp.float32(0.1), n_steps=3)
    p2, _, _, s2 = fns.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns.optimiser.init(params),
        jax.tree_util.tree_map(jnp.copy, buf), fns.dirs, transform, key,
        jnp.float32(0.1), n_steps=3)
    assert np.allclose(np.asarray(s1["total_loss"]),
                       np.asarray(s2["total_loss"]))
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_is_keyframe_logic():
    cfg, model, fns, params, opt_state, buf, transform = _tiny_setup()
    # train until the wall at z=2 is fitted
    key = jax.random.PRNGKey(3)
    p, o, b = params, opt_state, buf
    for _ in range(12):
        key, k = jax.random.split(key)
        p, o, b, _ = fns.train_bundle(p, o, b, fns.dirs, transform, k,
                                      jnp.float32(0.0), n_steps=10)

    depth = jnp.full((16, 24), 2.0)
    is_kf, prop = fns.is_keyframe(p, depth, jnp.eye(4), fns.dirs, transform,
                                  jax.random.PRNGKey(4), jnp.float32(0.0))
    # well-explained frame: most rays below threshold -> NOT a keyframe
    assert float(prop) > cfg.kf_pixel_ratio
    assert not bool(is_kf)

    # a very different view (wall at 0.5m) is poorly explained -> keyframe
    is_kf2, prop2 = fns.is_keyframe(
        p, jnp.full((16, 24), 0.5), jnp.eye(4), fns.dirs, transform,
        jax.random.PRNGKey(5), jnp.float32(0.0))
    assert float(prop2) < cfg.kf_pixel_ratio
    assert bool(is_kf2)


def test_reverse_fused_grad_mode_matches_auto():
    """The hand-derived custom-VJP executor produces the same training
    trajectory as XLA autodiff (same seeds)."""
    cfg, model, fns, params, opt_state, buf, transform = _tiny_setup()
    cfg2 = cfg.replace(grad_mode="reverse_fused")
    from isdf_tpu.engine.step import build_step_functions
    from isdf_tpu.ops import geometry as G
    fns2 = build_step_functions(cfg2, model, 16, 24,
                                G.ray_dirs_C(16, 24, 20.0, 20.0, 12.0, 8.0))
    key = jax.random.PRNGKey(11)
    p1, _, _, s1 = fns.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns.optimiser.init(params),
        jax.tree_util.tree_map(jnp.copy, buf), fns.dirs, transform, key,
        jnp.float32(0.0), n_steps=3)
    p2, _, _, s2 = fns2.train_bundle(
        jax.tree_util.tree_map(jnp.copy, params),
        fns2.optimiser.init(params),
        jax.tree_util.tree_map(jnp.copy, buf), fns2.dirs, transform, key,
        jnp.float32(0.0), n_steps=3)
    np.testing.assert_allclose(np.asarray(s1["total_loss"]),
                               np.asarray(s2["total_loss"]),
                               rtol=1e-4, atol=1e-6)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


@pytest.mark.parametrize("bounds_method", ["ray", "pc"])
def test_pallas_train_op_grad_mode_matches_reverse_fused(bounds_method):
    """The monolithic fused loss+grad kernel (interpret mode) produces the
    same training trajectory as the reverse_fused custom-VJP executor —
    for streamed ray bounds AND the in-kernel batch-distance bounds."""
    H, W = 16, 24
    cfg = Config().replace(
        n_rays=24, n_strat_samples=5, n_surf_samples=2,
        hidden_feature_size=256, hidden_layers_block=2, n_embed_funcs=5,
        kf_buffer_size=8, min_depth=0.07, max_depth=12.0,
        bounds_method=bounds_method,
        grad_mode="reverse_fused")
    model = M.SDFModel(
        embedding_size=cfg.embedding_size, hidden_size=256,
        hidden_layers_block=2, scale_output=cfg.scale_output,
        scale_input=cfg.scale_input, max_deg=5)
    dirs_C = G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2)
    params = M.init_params(jax.random.PRNGKey(0), model)
    buf = BUF.make_buffer(cfg.kf_buffer_size, H, W, with_normals=True)
    depth = jnp.full((H, W), 2.0)
    normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    buf = BUF.add_frame(buf, depth, jnp.eye(4), normals, 0, replace=False)
    transform = jnp.eye(4)
    key = jax.random.PRNGKey(11)

    results = []
    for mode_cfg in (cfg, cfg.replace(grad_mode="pallas",
                                      pallas_interpret=True)):
        fns = build_step_functions(mode_cfg, model, H, W, dirs_C)
        p, _, _, s = fns.train_bundle(
            jax.tree_util.tree_map(jnp.copy, params),
            fns.optimiser.init(params),
            jax.tree_util.tree_map(jnp.copy, buf), fns.dirs, transform,
            key, jnp.float32(0.0), n_steps=2)
        results.append((p, s))
    (p1, s1), (p2, s2) = results
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    # AdamW amplifies fp-ordering differences on near-zero grads to
    # O(lr * rel-diff); op-level grad equality is tested tightly in
    # tests/test_pallas_kernels.py — here assert trajectory agreement to
    # a small fraction of one update step (lr = 1.3e-3).
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) < 3e-4


def test_pose_refinement_reduces_pose_error_in_trainer():
    """Joint mapping/pose: with a map trained from a well-posed frame,
    refining a misposed frame's twist against |sdf| at its surface
    samples moves its buffer pose toward the true pose
    (engine/pose.py + Trainer.apply_pose_corrections)."""
    import dataclasses

    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=64, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=64, hidden_layers_block=1,
        n_embed_funcs=4, kf_buffer_size=8, refine_poses=True,
        bounds_method="ray",
        # this test verifies the SOLVER; the evidence gate (own test
        # below) would sit right at this scenario's ~27% improvement
        pose_min_rel_improve=0.05)
    # n_frames=60 -> 9 deg frame spacing: frames 0/1 share most of their
    # frustum, so the map trained on frame 0 covers frame 1's surface
    # (refinement cannot localise against unobserved regions); noise std
    # 0.03 makes the pose error large vs the map's own error
    ds = SyntheticDataset(SyntheticScene(), n_frames=60, H=32, W=48,
                          pose_noise_std=0.03)
    tr = Trainer(cfg, dataset=ds, seed=0)

    # frame 0 ingested with its TRUE pose; train the map on it
    f0 = tr.get_data([0])[0]
    f0 = dataclasses.replace(f0, T_WC=ds.poses[0])
    tr.last_is_keyframe = True
    tr.add_frame(f0)
    for _ in range(15):
        tr.run_steps(30)

    # frame 1 arrives with a NOISY pose
    f1 = tr.get_data([1])[0]
    assert f1.T_WC_gt is not None
    tr.last_is_keyframe = True
    tr.add_frame(f1)
    T_gt = ds.poses[1]
    err0 = float(np.abs(np.asarray(tr.buffer.T_WC[1]) - T_gt).max())

    tr.refine_poses_step(n_steps=60)
    tr.apply_pose_corrections()
    err1 = float(np.abs(np.asarray(tr.buffer.T_WC[1]) - T_gt).max())
    assert np.isfinite(err1)
    assert err1 < err0 * 0.7, (err0, err1)
    # twists were folded in and reset
    assert float(jnp.abs(tr.pose_state.twists).max()) == 0.0


def test_pose_correction_evidence_gate():
    """apply_pose_corrections discards a burst whose loss barely
    improved (weak evidence = map-bias noise): buffer poses unchanged,
    twists still reset."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=4,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4, refine_poses=True)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=16, W=24)
    tr = Trainer(cfg, dataset=ds, seed=0)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    T_before = np.asarray(tr.buffer.T_WC[0])

    tr.pose_state = tr.pose_state._replace(
        twists=tr.pose_state.twists.at[0, 3].set(0.05))
    tr._last_burst_rel_improve = 0.01          # below the 0.25 default gate
    tr.apply_pose_corrections()
    np.testing.assert_array_equal(np.asarray(tr.buffer.T_WC[0]), T_before)
    assert float(jnp.abs(tr.pose_state.twists).max()) == 0.0

    tr.pose_state = tr.pose_state._replace(
        twists=tr.pose_state.twists.at[0, 3].set(0.05))
    tr._last_burst_rel_improve = 0.5           # strong evidence: folds
    tr.apply_pose_corrections()
    assert abs(float(np.asarray(tr.buffer.T_WC[0])[0, 3])
               - (T_before[0, 3] + 0.05)) < 1e-5
    assert float(jnp.abs(tr.pose_state.twists).max()) == 0.0


def test_pose_burst_skip_gate_on_render_evidence():
    """should_refine_pose skips bursts when the latest keyframe check
    found the frame already well explained (no drift evidence): the
    below-threshold proportion from is_keyframe gates the burst, and
    pose_skip_prop=0 disables the gate (always refine)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=4,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4, refine_poses=True)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=16, W=24)
    tr = Trainer(cfg, dataset=ds, seed=0)

    assert tr.should_refine_pose()             # no evidence yet -> refine
    tr._last_kf_prop = 0.95                    # well explained -> skip
    assert not tr.should_refine_pose()
    tr._last_kf_prop = 0.40                    # map disagrees -> refine
    assert tr.should_refine_pose()

    tr.cfg = cfg.replace(pose_skip_prop=0.0)   # gate off
    tr._last_kf_prop = 0.99
    assert tr.should_refine_pose()

    # is_keyframe records the proportion (the gate's input signal)
    tr.cfg = cfg
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    tr.is_keyframe(tr.frames[-1])
    assert 0.0 <= tr._last_kf_prop <= 1.0


def test_chunked_eval_batched_matches_single():
    """Multi-chunk queries go through ONE lax.map dispatch; results equal
    the single-chunk path."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=8, n_strat_samples=4,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=16, W=24)
    tr = Trainer(cfg, dataset=ds, seed=0)
    pts = np.random.default_rng(0).uniform(-2, 2, (150, 3)).astype(
        np.float32)

    ref_sdf = tr.sdf_fn(pts)          # single-chunk path (150 < 256k)
    ref_grad = tr.grad_fn(pts)
    tr.chunk_size = 64                # force the batched path (3 chunks)
    np.testing.assert_allclose(tr.sdf_fn(pts), ref_sdf, atol=1e-6)
    np.testing.assert_allclose(tr.grad_fn(pts), ref_grad, atol=1e-6)


def test_sparse_sdf_grid_meshes_identically():
    """Coarse-to-fine grid eval (get_sdf_grid_sparse) yields the exact
    same marching-tets mesh as the dense grid while evaluating a
    fraction of the points — every fine cell containing a zero crossing
    lies fully inside an active coarse cell, so its corner values are
    exact."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.mesh3d import marching_tetrahedra

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=64, n_strat_samples=6,
        n_surf_samples=3, hidden_feature_size=64, hidden_layers_block=1,
        n_embed_funcs=4, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    tr = Trainer(cfg, dataset=ds, seed=0, grid_dim=72)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    for _ in range(6):
        tr.run_steps(25)

    # correctness on the learned field (whatever its Lipschitz quality):
    # identical mesh to the dense grid
    dense = tr.get_sdf_grid()
    sparse, _ = tr.get_sdf_grid_sparse(stride=2, safety=2.0)
    v_d, f_d = marching_tetrahedra(dense, level=0.0)
    v_s, f_s = marching_tetrahedra(sparse, level=0.0)
    assert len(v_d) > 0
    np.testing.assert_array_equal(f_d, f_s)
    np.testing.assert_allclose(v_s, v_d, atol=1e-6)

    # saving on a true 1-Lipschitz field (the scene's analytic GT): the
    # far field prunes (a fresh net under-trains its far field and
    # legitimately prunes little — the criterion errs conservative).
    # 0.66 at this coarse 72^3 test grid; 0.28 at the production 200^3
    tr.sdf_fn = lambda pts: ds.scene.sdf_np(np.asarray(pts))
    dense_gt = tr.get_sdf_grid()
    sparse_gt, frac = tr.get_sdf_grid_sparse(stride=2, safety=2.0)
    assert frac < 0.75, frac
    v_d, f_d = marching_tetrahedra(dense_gt, level=0.0)
    v_s, f_s = marching_tetrahedra(sparse_gt, level=0.0)
    np.testing.assert_array_equal(f_d, f_s)
    np.testing.assert_allclose(v_s, v_d, atol=1e-6)


def test_forced_keyframe_after_five_seconds():
    """Reference trainer.py:639-642: >5 s since the last keyframe forces
    promotion regardless of the render test."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=40, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=30, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=8, n_rays_is_kf=50)
    tr = Trainer(cfg, dataset=ds, seed=5)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([1])[0])  # kf at frame_id 1
    tr.run_steps(10)

    # train long enough that the frozen net explains the same view well
    for _ in range(6):
        tr.run_steps(10)
    tr.frozen_params = jax.tree_util.tree_map(jnp.copy, tr.params)

    # same viewpoint again: is_keyframe would say no...
    tr.add_frame(tr.get_data([2])[0])
    tr.tot_step_time = 1.0
    tr.steps_since_frame = tr.optim_frames
    add_new = tr.check_keyframe_latest()
    was_kf_soon = tr.last_is_keyframe

    # ...but after >5 sim-seconds since the last keyframe it is forced
    tr.last_is_keyframe = False
    tr.add_frame(tr.get_data([3])[0])
    tr.tot_step_time = 1.0 / 30 + 6.0  # frame_id[-2]/fps + >5s
    tr.steps_since_frame = tr.optim_frames
    tr.check_keyframe_latest()
    assert tr.last_is_keyframe
    assert tr.optim_frames == cfg.iters_per_kf
    assert tr.noise_std == cfg.noise_kf


def test_replace_semantics_in_trainer():
    """A non-keyframe latest frame is replaced by the next ingested frame
    (reference trainer.py:564-572)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=20, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=30, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=8)
    tr = Trainer(cfg, dataset=ds, seed=6)
    tr.add_frame(tr.get_data([0])[0])
    tr.last_is_keyframe = True            # t==0 bootstrap (train.py:125-127)
    assert int(tr.buffer.count) == 1
    tr.add_frame(tr.get_data([5])[0])     # prev promoted -> appended
    assert int(tr.buffer.count) == 2
    assert int(tr.buffer.frame_id[1]) == 5
    # frame 5 was NOT promoted -> the next frame replaces it
    tr.add_frame(tr.get_data([7])[0])
    assert int(tr.buffer.count) == 2
    assert int(tr.buffer.frame_id[1]) == 7
    assert int(tr.buffer.frame_id[0]) == 0
    assert len(tr.frames) == 2
    assert tr.frames[-1].frame_id == 7


def test_buffer_overflow_raises_with_remedy():
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=20, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=30, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=2, kf_eviction="error")
    tr = Trainer(cfg, dataset=ds, seed=6)
    for i in range(2):
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([i])[0])
    tr.last_is_keyframe = True
    with pytest.raises(RuntimeError, match="kf_buffer_size"):
        tr.add_frame(tr.get_data([2])[0])


def test_step_timer_wired_into_trainer():
    """utils/profiling feeds the product: run_steps records train time and
    perf_summary reports steps/s (VERDICT r1 item 7)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    tr = Trainer(cfg, dataset=ds, seed=0)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    tr.run_steps(3)
    tr.step_timer.add("vis", 0.01)
    s = tr.perf_summary()
    assert s["train"] > 0 and s["vis"] == 0.01
    assert s["steps_per_sec"] > 0


def test_bill_exact_pins_sim_clock_to_fixed_dt():
    """Clock-free parity harnesses pin _per_step_device_s and set
    _bill_exact: the sim clock must advance exactly n_steps * dt per
    bundle, ignoring run_steps' min(dt, wall) cap (a fast host would
    otherwise under-advance the clock and hand the harness extra
    steps per sim-second — reference_parity/run_ours.py)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    tr = Trainer(cfg, dataset=ds, seed=0)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    tr.run_steps(2)  # warm the bundle so walls are small

    # a per-step cost far above any plausible wall for 3 tiny steps:
    # without _bill_exact the wall cap bites, with it the clock is exact
    tr._per_step_device_s = 100.0
    t0 = tr.tot_step_time
    tr.run_steps(3)
    assert tr.tot_step_time - t0 < 300.0  # capped at wall

    tr._bill_exact = True
    t0 = tr.tot_step_time
    tr.run_steps(3)
    assert abs((tr.tot_step_time - t0)
               - 300.0 / cfg.frac_time_perception) < 1e-6


def test_step_rate_cap_bills_floor_and_matches_pinned_clock():
    """cfg.step_rate_cap R: when the device outruns the cap each step
    bills at least 1/R perception-seconds (the surplus is idle time for
    other scenes); a slower-than-cap device bills its real cost. A capped
    fast trainer must follow EXACTLY the trajectory of a clock pinned to
    1/R (the protocol of experiments/quality_compute_curve, whose
    quality results therefore transfer to the shipped knob)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer

    base = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4, do_eval=False, n_steps=60)

    def make(cfg, per_step):
        ds = SyntheticDataset(SyntheticScene(), n_frames=6, H=24, W=32)
        tr = Trainer(cfg, dataset=ds, seed=0)
        tr._per_step_device_s = per_step
        tr._bill_exact = True
        return tr

    # fast device (1/633 s/step) + cap 123 -> bills exactly n/123
    tr = make(base.replace(step_rate_cap=123.0), 1.0 / 633.0)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    t0 = tr.tot_step_time
    tr.run_steps(4)
    assert abs((tr.tot_step_time - t0) - 4 / 123.0) < 1e-9

    # slow device (1 s/step) + cap 123 -> cap is a floor, not a clamp
    tr._per_step_device_s = 1.0
    t0 = tr.tot_step_time
    tr.run_steps(2)
    assert abs((tr.tot_step_time - t0) - 2.0) < 1e-9

    # full-loop trajectory: capped-fast == pinned-to-1/R
    capped = train_loop(make(base.replace(step_rate_cap=123.0),
                             1.0 / 633.0), log_fn=None)
    pinned = train_loop(make(base, 1.0 / 123.0), log_fn=None)
    assert capped.steps == pinned.steps
    assert capped.kf_indices == pinned.kf_indices
    assert abs(capped.tot_step_time - pinned.tot_step_time) < 1e-6


def test_evict_lowest_priority_compacts_in_order():
    buf = BUF.make_buffer(5, 8, 8, with_normals=False)
    for i in range(5):
        buf = BUF.add_frame(buf, jnp.full((8, 8), float(i)), jnp.eye(4),
                            jnp.zeros((0,)), i * 10, replace=False)
    # priorities: row 1 is the cheapest among the evictable pool [0..2]
    buf = buf._replace(
        frame_avg_loss=jnp.asarray([0.5, 0.1, 0.9, 0.05, 0.02]))
    out = BUF.evict_lowest_priority(buf, keep_recent=2)
    assert int(out.count) == 4
    # row 1 gone; order preserved; newest two untouched despite low loss
    assert np.asarray(out.frame_id[:4]).tolist() == [0, 20, 30, 40]
    assert np.allclose(np.asarray(out.frame_avg_loss[:4]),
                       [0.5, 0.9, 0.05, 0.02])
    assert float(out.depth[1, 0, 0]) == 2.0
    assert int(out.frame_id[4]) == -1


def test_long_sequence_trains_past_capacity_with_eviction():
    """kf_buffer_size < #keyframes trains to completion (VERDICT r1
    item 6) and keeps learning."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=20, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=30, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    tr = Trainer(cfg, dataset=ds, seed=6)
    first = last = None
    for i in range(8):      # 8 forced keyframes through a 4-slot arena
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([i * 2])[0])
        s = tr.run_steps(6)
        if first is None:
            first = float(s["total_loss"][0])
        last = float(s["total_loss"][-1])
    assert int(tr.buffer.count) == 4
    assert len(tr.frames) == 8          # host store keeps the history
    assert int(tr.buffer.frame_id[3]) == 14   # newest survived
    assert np.isfinite(last) and last < first


def test_frozen_params_survive_donated_bundle():
    """frozen_params must be a COPY of params, never an alias: the train
    bundle donates params, and an aliased snapshot would be deleted with
    them — is_keyframe / save_checkpoint read frozen_params before any
    keyframe promotion refreshes it (regression: tree_map identity alias
    at Trainer init)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer

    ds = SyntheticDataset(SyntheticScene(), n_frames=6, H=24, W=32)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=8)
    tr = Trainer(cfg, dataset=ds, seed=0)
    # ingest WITHOUT promoting a keyframe first (the t=0 loop order:
    # add_frame runs while last_is_keyframe is still False)
    tr.add_frame(tr.get_data([0])[0])
    tr.run_steps(2)  # donates params/opt/buffer
    for leaf in jax.tree_util.tree_leaves(tr.frozen_params):
        np.asarray(leaf)  # raises RuntimeError if the buffer was donated
