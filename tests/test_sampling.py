import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import sampling as S
from isdf_tpu.ops import geometry as g


def test_sample_pixels_ranges():
    ib, ih, iw = S.sample_pixels(jax.random.PRNGKey(0), 50, 3, 68, 120)
    assert ib.shape == ih.shape == iw.shape == (150,)
    assert np.array_equal(np.asarray(ib), np.repeat(np.arange(3), 50))
    assert int(ih.min()) >= 0 and int(ih.max()) < 68
    assert int(iw.min()) >= 0 and int(iw.max()) < 120


def test_stratified_sample_in_bins():
    key = jax.random.PRNGKey(1)
    max_d = jnp.asarray(np.full(64, 4.0, np.float32))
    z = np.asarray(S.stratified_sample(key, 1.0, max_d, 6))
    assert z.shape == (64, 6)
    lims = np.linspace(1.0, 4.0, 7)
    for b in range(6):
        assert (z[:, b] >= lims[b] - 1e-5).all()
        assert (z[:, b] <= lims[b + 1] + 1e-5).all()


def test_sample_along_rays_layout():
    key = jax.random.PRNGKey(2)
    R = 32
    T = jnp.broadcast_to(jnp.eye(4), (R, 4, 4))
    dirs_C = jnp.tile(jnp.asarray([[0.1, -0.1, 1.0]]), (R, 1))
    depth = jnp.full((R,), 2.0)
    pc, z, origins, dirs_W = S.sample_along_rays(
        key, T, dirs_C, depth, min_depth=0.07, dist_behind_surf=0.1,
        n_strat_samples=19, n_surf_samples=8)
    assert pc.shape == (R, 27, 3)
    assert z.shape == (R, 27)
    # sample 0 is the exact surface depth
    assert np.allclose(np.asarray(z[:, 0]), 2.0)
    # surface Gaussian samples are clamped to [min_depth, depth + behind]
    assert float(z[:, 1:8].min()) >= 0.07 - 1e-6
    assert float(z[:, 1:8].max()) <= 2.1 + 1e-6
    # stratified samples span [min_depth, depth + behind]
    assert float(z[:, 8:].max()) <= 2.1 + 1e-6
    # pc = o + d*z exactly
    want = np.asarray(dirs_W)[:, None, :] * np.asarray(z)[:, :, None]
    assert np.allclose(np.asarray(pc), want, atol=1e-6)


def test_sample_rays_from_frames_masks():
    key = jax.random.PRNGKey(3)
    F, H, W = 3, 16, 16
    depth = np.full((F, H, W), 2.0, np.float32)
    depth[0, :8] = 0.0  # invalid half of frame 0
    T = jnp.broadcast_to(jnp.eye(4), (F, 4, 4))
    dirs = g.ray_dirs_C(H, W, 20.0, 20.0, 8.0, 8.0)
    frame_valid = jnp.asarray([True, True, False])  # frame 2 is padding

    rs = S.sample_rays_from_frames(
        key, jnp.asarray(depth), T, dirs, None, frame_valid,
        n_rays=100, min_depth=0.07, dist_behind_surf=0.1,
        n_strat_samples=5, n_surf_samples=2)

    v = np.asarray(rs.valid)
    ib = np.asarray(rs.indices_b)
    ih = np.asarray(rs.indices_h)
    # all rays of padded frame invalid
    assert not v[ib == 2].any()
    # frame 0: valid iff sampled in the lower half
    assert (v[(ib == 0)] == (ih[(ib == 0)] >= 8)).all()
    # frame 1 fully valid
    assert v[ib == 1].all()
    # masked depth replaced by safe value (no zeros)
    assert float(rs.depth.min()) > 0
    # static shapes
    assert rs.pc.shape == (300, 7, 3)


def test_sample_rays_nan_normals_masked():
    key = jax.random.PRNGKey(4)
    F, H, W = 1, 8, 8
    depth = np.full((F, H, W), 2.0, np.float32)
    normals = np.zeros((F, H, W, 3), np.float32)
    normals[..., 2] = -1.0
    normals[0, :4, :, :] = np.nan
    rs = S.sample_rays_from_frames(
        key, jnp.asarray(depth), jnp.broadcast_to(jnp.eye(4), (F, 4, 4)),
        g.ray_dirs_C(H, W, 10.0, 10.0, 4.0, 4.0), jnp.asarray(normals),
        jnp.asarray([True]), n_rays=64, min_depth=0.07,
        dist_behind_surf=0.1, n_strat_samples=3, n_surf_samples=1)
    v = np.asarray(rs.valid)
    ih = np.asarray(rs.indices_h)
    assert (v == (ih >= 4)).all()
    # NaNs never reach downstream
    assert np.isfinite(np.asarray(rs.normals)).all()


def test_sample_pixels_active_targets_high_loss_blocks():
    """Active rays concentrate on high-loss blocks; uniform fraction still
    covers the image; empty grids degrade to uniform."""
    import jax
    import jax.numpy as jnp

    from isdf_tpu.ops.sampling import sample_pixels_active

    H, W, F, n_rays = 64, 64, 2, 400
    grids = jnp.zeros((F, 8, 8))
    # frame 0: all loss in block (0, 0); frame 1: empty (uniform)
    grids = grids.at[0, 0, 0].set(5.0)
    ib, ih, iw = sample_pixels_active(
        jax.random.PRNGKey(0), n_rays, F, H, W, grids, active_frac=0.5)
    ib, ih, iw = np.asarray(ib), np.asarray(ih), np.asarray(iw)
    assert ib.shape == (F * n_rays,)
    assert (ih >= 0).all() and (ih < H).all()
    assert (iw >= 0).all() and (iw < W).all()

    f0 = ib == 0
    in_block = (ih[f0] < 8) & (iw[f0] < 8)
    # ~50% active rays all in block (0,0) + 50/4096 uniform strays
    assert in_block.mean() > 0.45
    # frame 1 (empty grid): near-uniform — block (0,0) holds ~1/64
    f1 = ib == 1
    in_b1 = (ih[f1] < 8) & (iw[f1] < 8)
    assert in_b1.mean() < 0.1


def test_active_sampling_step_trains():
    """do_active=True runs the full step and persists loss_approx grids."""
    import jax
    import jax.numpy as jnp

    from isdf_tpu.engine import buffer as BUF
    from isdf_tpu.engine.step import build_step_functions
    from isdf_tpu.models import sdf_mlp as M
    from isdf_tpu.ops import geometry as G
    from isdf_tpu.utils.config import Config

    cfg = Config().replace(
        n_rays=32, n_strat_samples=5, n_surf_samples=3,
        hidden_feature_size=32, hidden_layers_block=1, n_embed_funcs=3,
        kf_buffer_size=8, do_active=True)
    H, W = 16, 24
    model = M.SDFModel(embedding_size=cfg.embedding_size, hidden_size=32,
                       hidden_layers_block=1, scale_input=cfg.scale_input,
                       max_deg=3)
    fns = build_step_functions(
        cfg, model, H, W, G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2))
    params = M.init_params(jax.random.PRNGKey(0), model)
    buf = BUF.make_buffer(8, H, W, with_normals=cfg.do_normal)
    depth = jnp.full((H, W), 2.0)
    normals = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    buf = BUF.add_frame(buf, depth, jnp.eye(4), normals, 0, replace=False)
    p, o, b, s = fns.train_bundle(
        params, fns.optimiser.init(params), buf, fns.dirs, jnp.eye(4),
        jax.random.PRNGKey(1), jnp.float32(0.0), n_steps=4)
    assert np.isfinite(np.asarray(s["total_loss"])).all()
    assert float(b.loss_approx[0].max()) > 0    # grid persisted
