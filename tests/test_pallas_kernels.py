"""Pallas kernels tested in interpreter mode (CPU) against XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.fused_vjp import make_reverse_fused_mlp
from isdf_tpu.models.pallas_mlp import make_pallas_reverse_fused
from isdf_tpu.models.sdf_mlp import _pe_factored
from isdf_tpu.ops import bounds as B
from isdf_tpu.ops.pallas.bounds_pc import closest_surface_ix


def _mlp_setup(n=700, seed=0, transform=True):
    model = M.SDFModel()  # full-size: the kernel asserts hidden=256
    params = M.init_params(jax.random.PRNGKey(seed), model)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3)) * 1.5
    T = None
    if transform:
        import scipy.spatial.transform as st
        R = st.Rotation.from_euler("xyz", [0.3, -0.2, 1.1]).as_matrix()
        T = jnp.asarray(np.block(
            [[R, np.array([[0.4], [-0.2], [0.9]])],
             [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))
    pe, cos_b, dxs, dproj2 = _pe_factored(x, model, T)
    return model, params, (pe, cos_b, dxs, dproj2)


def test_pallas_reverse_fused_primal_matches_jnp():
    model, params, args = _mlp_setup()
    jnp_op = make_reverse_fused_mlp(model, 2)
    pl_op = make_pallas_reverse_fused(model, 2, interpret=True,
                                      force_f32=True)
    raw_j, graw_j = jnp_op(params, *args)
    raw_p, graw_p = pl_op(params, *args)
    np.testing.assert_allclose(np.asarray(raw_p), np.asarray(raw_j),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(graw_p), np.asarray(graw_j),
                               atol=2e-5, rtol=1e-4)


def test_pallas_train_op_matches_jnp_loss_pipeline():
    """The monolithic fused loss+grad kernel == jnp losses + autodiff."""
    from isdf_tpu.models.pallas_mlp import make_pallas_train_op
    from isdf_tpu.ops import losses as L
    from isdf_tpu.ops.bounds import cos_sim

    R, S = 40, 7
    N = R * S
    model, params, (pe, cos_b, dxs, dproj2) = _mlp_setup(n=N, seed=7)
    so = model.scale_output
    rng = np.random.default_rng(11)
    bounds = jnp.asarray(rng.normal(0.1, 0.4, (R, S)).astype(np.float32))
    ray_valid = jnp.asarray(rng.random(R) > 0.25)
    noise = jnp.asarray(rng.normal(0, 0.03, N).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32))
    kw = dict(loss_type="L1", trunc_distance=0.1, trunc_weight=5.3,
              eik_apply_dist=0.1, eik_weight=0.268, grad_weight=0.018,
              orien_loss=False)
    jnp_op = make_reverse_fused_mlp(model, 2)

    def ref_loss(p):
        raw, graw = jnp_op(p, pe, cos_b, dxs, dproj2)
        sdf = (raw + noise).reshape(R, S) * so
        g = (graw * so).reshape(R, S, 3)
        mat, fs = L.sdf_loss(sdf, bounds, kw["trunc_distance"], "L1")
        eik = jnp.abs(jnp.linalg.norm(g, axis=-1) - 1.0)
        gmat = 1.0 - cos_sim(gt, g)
        out = L.tot_loss(mat, gmat, eik, fs, bounds, ray_valid,
                         kw["eik_apply_dist"], kw["trunc_weight"],
                         kw["grad_weight"], kw["eik_weight"])
        return out.total, out

    (tot_j, out_j), g_j = jax.value_and_grad(ref_loss, has_aux=True)(params)

    op = make_pallas_train_op(model, 2, **kw, interpret=True,
                              force_f32=True)
    vflat = jnp.broadcast_to(ray_valid[:, None], (R, S)).reshape(-1)
    C = S * ray_valid.sum()
    invC = jnp.where(C > 0, 1.0 / jnp.maximum(C, 1), 0.0)
    sums, ploss, g_p = op(params, pe, dxs, dproj2,
                          bounds.reshape(-1), vflat.astype(jnp.float32),
                          noise, gt.reshape(N, 3), invC)

    np.testing.assert_allclose(float(sums[0] * invC), float(tot_j),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(sums[1] * invC),
                               float(out_j.scalars["sdf_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(sums[2] * invC),
                               float(out_j.scalars["grad_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(sums[3] * invC),
                               float(out_j.scalars["eikonal_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ploss).reshape(R, S),
                               np.asarray(out_j.mat), atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_j)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=2e-3)


def test_pallas_train_op_pe_in_kernel_matches_streamed():
    """pe_in_kernel=True (PE built inside the kernel from world xyz via
    the packed affine plane, sdf_mlp._pe_consts) == the streamed-pe op."""
    import scipy.spatial.transform as st

    from isdf_tpu.models.pallas_mlp import make_pallas_train_op

    model = M.SDFModel()
    params = M.init_params(jax.random.PRNGKey(2), model)
    N = 300
    x = jax.random.normal(jax.random.PRNGKey(3), (N, 3)) * 1.5
    R = st.Rotation.from_euler("xyz", [0.3, -0.2, 1.1]).as_matrix()
    T = jnp.asarray(np.block(
        [[R, np.array([[0.4], [-0.2], [0.9]])],
         [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))
    pe, _, dxs, dproj2 = _pe_factored(x, model, T)

    rng = np.random.default_rng(4)
    bounds = jnp.asarray(rng.normal(0.1, 0.4, N).astype(np.float32))
    valid = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))
    noise = jnp.asarray(rng.normal(0, 0.03, N).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    invC = jnp.float32(1.0 / max(float(valid.sum()), 1.0))
    kw = dict(loss_type="L1", trunc_distance=0.1, trunc_weight=5.3,
              eik_apply_dist=0.1, eik_weight=0.268, grad_weight=0.018,
              orien_loss=False)

    op_s = make_pallas_train_op(model, 2, **kw, interpret=True,
                                force_f32=True)
    op_k = make_pallas_train_op(model, 2, **kw, interpret=True,
                                force_f32=True, pe_in_kernel=True)
    sums_s, pl_s, g_s = op_s(params, pe, dxs, dproj2, bounds, valid,
                             noise, gt, invC)
    sums_k, pl_k, g_k = op_k(params, T, x, bounds, valid, noise, gt, invC)

    np.testing.assert_allclose(np.asarray(sums_k), np.asarray(sums_s),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pl_k), np.asarray(pl_s),
                               atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=2e-3)


def test_pallas_train_op_pc_bounds_in_kernel_matches_streamed():
    """pc_bounds=True (batch-distance bounds + grad targets computed
    in-kernel) == streaming bounds from ops/bounds.py::bounds_pc plus the
    step.py gt assembly."""
    import scipy.spatial.transform as st

    from isdf_tpu.models.pallas_mlp import make_pallas_train_op

    model = M.SDFModel()
    params = M.init_params(jax.random.PRNGKey(8), model)
    R, S = 24, 9
    N = R * S
    rng = np.random.default_rng(9)
    # rays from the origin through a wall at z≈2: surface sample first
    depth = jnp.asarray(rng.uniform(1.5, 2.5, R).astype(np.float32))
    z_vals = jnp.sort(jnp.asarray(
        rng.uniform(0.1, 2.7, (R, S)).astype(np.float32)), axis=1)
    z_vals = z_vals.at[:, 0].set(depth)  # index 0 = exact surface sample
    dirs = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pc = dirs[:, None, :] * z_vals[..., None]
    flat = pc.reshape(N, 3)
    valid = jnp.asarray(rng.random(R) > 0.2)
    normals = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    noise = jnp.asarray(rng.normal(0, 0.03, N).astype(np.float32))

    Rm = st.Rotation.from_euler("xyz", [0.3, -0.2, 1.1]).as_matrix()
    T = jnp.asarray(np.block(
        [[Rm, np.array([[0.4], [-0.2], [0.9]])],
         [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))

    bnd = B.bounds_pc(pc, z_vals, depth, valid, do_grad=True)
    gv = jnp.where(bnd.grad_valid[..., None], bnd.grad,
                   normals[:, None, :])
    gt = jnp.concatenate(
        [jnp.broadcast_to(normals[:, None, :], (R, 1, 3)), gv],
        axis=1).reshape(N, 3)
    vflat = jnp.broadcast_to(valid[:, None], (R, S)).reshape(-1)
    invC = jnp.float32(1.0 / max(float(S * valid.sum()), 1.0))
    kw = dict(loss_type="L1", trunc_distance=0.1, trunc_weight=5.3,
              eik_apply_dist=0.1, eik_weight=0.268, grad_weight=0.018,
              orien_loss=False)

    op_s = make_pallas_train_op(model, 2, **kw, interpret=True,
                                force_f32=True, pe_in_kernel=True)
    sums_s, pl_s, g_s = op_s(params, T, flat, bnd.bounds.reshape(-1),
                             vflat.astype(jnp.float32), noise, gt, invC)

    op_k = make_pallas_train_op(model, 2, **kw, interpret=True,
                                force_f32=True, pe_in_kernel=True,
                                pc_bounds=True)
    zd = (z_vals - depth[:, None]).reshape(-1)
    normals_pt = jnp.broadcast_to(
        normals[:, None, :], (R, S, 3)).reshape(N, 3)
    is_surf = jnp.zeros((R, S)).at[:, 0].set(1.0).reshape(-1)
    sums_k, pl_k, g_k = op_k(
        params, T, flat, pc[:, 0], valid.astype(jnp.float32), zd,
        normals_pt, is_surf, vflat.astype(jnp.float32), noise, invC)

    np.testing.assert_allclose(np.asarray(sums_k), np.asarray(sums_s),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pl_k), np.asarray(pl_s),
                               atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=2e-3)


def test_pallas_reverse_fused_backward_matches_jnp():
    model, params, args = _mlp_setup(n=300, seed=3)
    jnp_op = make_reverse_fused_mlp(model, 2)
    pl_op = make_pallas_reverse_fused(model, 2, interpret=True,
                                      force_f32=True)

    def loss(op):
        def f(p):
            raw, graw = op(p, *args)
            eik = jnp.abs(jnp.linalg.norm(graw, axis=-1) - 1.0).mean()
            gsum = (graw * jnp.array([0.2, -0.5, 1.0])).sum(-1).mean()
            return jnp.abs(raw).mean() + 0.3 * eik + 0.1 * gsum
        return f

    l_j, g_j = jax.value_and_grad(loss(jnp_op))(params)
    l_p, g_p = jax.value_and_grad(loss(pl_op))(params)
    np.testing.assert_allclose(float(l_p), float(l_j), rtol=1e-5)
    flat_j = jax.tree_util.tree_leaves(g_j)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_p, flat_j):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-3)


def test_closest_surface_ix_matches_argmin():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(700, 3)).astype(np.float32) * 2.0
    surf = rng.normal(size=(90, 3)).astype(np.float32) * 2.0
    valid = np.ones(90, bool)
    valid[10:20] = False

    got = np.asarray(closest_surface_ix(
        jnp.asarray(pts), jnp.asarray(surf), jnp.asarray(valid),
        interpret=True))

    d2 = ((pts[:, None] - surf[None]) ** 2).sum(-1)
    d2[:, ~valid] = np.inf
    want = d2.argmin(axis=1)
    # ties are virtually impossible with random data; require exact match
    assert np.array_equal(got, want)


def test_bounds_pc_pallas_matches_xla():
    rng = np.random.default_rng(1)
    R, S = 40, 7
    origins = rng.normal(size=(R, 3)).astype(np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    z = np.sort(rng.uniform(0.5, 3.0, (R, S)).astype(np.float32), axis=1)
    depth = z[:, 0] + rng.uniform(0, 0.5, R).astype(np.float32)
    pc = origins[:, None] + dirs[:, None] * z[..., None]
    valid = rng.random(R) > 0.2

    a = B.bounds_pc(jnp.asarray(pc), jnp.asarray(z), jnp.asarray(depth),
                    jnp.asarray(valid), do_grad=True, pallas_mode=None)
    b = B.bounds_pc(jnp.asarray(pc), jnp.asarray(z), jnp.asarray(depth),
                    jnp.asarray(valid), do_grad=True,
                    pallas_mode="interpret")
    assert np.allclose(np.asarray(a.bounds), np.asarray(b.bounds),
                       atol=1e-5)
    assert np.allclose(np.asarray(a.grad), np.asarray(b.grad), atol=1e-5)
