import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import bounds as B
from isdf_tpu.ops import losses as L


def test_bounds_ray_formula():
    depth = jnp.asarray([2.0, 3.0])
    z = jnp.asarray([[1.0, 2.0, 2.5], [1.0, 3.0, 4.0]])
    dirs_C = jnp.asarray([[0.0, 0.0, 1.0], [0.3, 0.4, 1.0]])
    dirs_W = dirs_C
    out = B.bounds_ray(depth, z, dirs_C, dirs_W)
    n1 = float(jnp.linalg.norm(dirs_C[1]))
    want = np.array([[1.0, 0.0, -0.5],
                     [2.0 * n1, 0.0, -1.0 * n1]])
    assert np.allclose(np.asarray(out.bounds), want, atol=1e-6)
    # grad = -viewing dir, for samples 1..S-1
    assert out.grad.shape == (2, 2, 3)
    assert np.allclose(np.asarray(out.grad[0, 0]), [0, 0, -1])


def test_bounds_normal_cos_correction():
    # ray hits a plane at 45 deg: bound within trunc region is scaled by cos
    depth = jnp.asarray([2.0])
    z = jnp.asarray([[1.0, 1.95]])
    dirs_C = jnp.asarray([[0.0, 0.0, 1.0]])
    n45 = jnp.asarray([[0.0, np.sqrt(0.5), -np.sqrt(0.5)]])
    out = B.bounds_normal(depth, z, dirs_C, n45, 0.3, dirs_C)
    ray_b = np.array([1.0, 0.05])
    cos = np.sqrt(0.5)
    want0 = ray_b[0] - 0.3 * (1 - cos)     # outside trunc: subtract
    want1 = ray_b[1] * cos                 # inside trunc: scale
    assert np.allclose(np.asarray(out.bounds[0]), [want0, want1], atol=1e-6)


def test_bounds_pc_exact_on_small_case():
    # 2 rays along +z from origin; surfaces at z=2 (ray0) and z=4 (ray1)
    z = jnp.asarray([[2.0, 1.0, 2.5], [4.0, 3.0, 4.5]])
    depth = jnp.asarray([2.0, 4.0])
    origins = np.zeros((2, 3), np.float32)
    d = np.array([[0, 0, 1.0], [1.0, 0, 0]], np.float32)  # ray1 along +x
    pc = origins[:, None, :] + d[:, None, :] * np.asarray(z)[:, :, None]
    out = B.bounds_pc(jnp.asarray(pc), z, depth, jnp.asarray([True, True]))
    b = np.asarray(out.bounds)
    # ray0 sample z=1.0 -> point (0,0,1): nearest surf is (0,0,2) dist 1
    assert np.isclose(b[0, 1], 1.0, atol=1e-5)
    # ray0 sample z=2.5 (behind surf): dist 0.5, negative
    assert np.isclose(b[0, 2], -0.5, atol=1e-5)
    # ray1 sample x=3 -> nearest of {(0,0,2),(4,0,0)} is (4,0,0) dist 1
    assert np.isclose(b[1, 1], 1.0, atol=1e-5)
    # grad for ray0 z=1.0 points from surf to sample: (0,0,-1)
    grad = np.asarray(out.grad)
    assert np.allclose(grad[0, 0], [0, 0, -1], atol=1e-5)
    # behind-surface grad flipped: sample z=2.5, diff dir (0,0,1) -> flipped
    assert np.allclose(grad[0, 1], [0, 0, -1], atol=1e-5)


def test_bounds_pc_invalid_rays_excluded():
    z = jnp.asarray([[2.0, 1.0], [0.5, 0.4]])
    depth = jnp.asarray([2.0, 0.5])
    origins = np.zeros((2, 3), np.float32)
    d = np.array([[0, 0, 1.0], [0, 0, 1.0]], np.float32)
    pc = origins[:, None, :] + d[:, None, :] * np.asarray(z)[:, :, None]
    # ray1 invalid: its surface point (0,0,0.5) must not attract ray0 samples
    out = B.bounds_pc(jnp.asarray(pc), z, depth, jnp.asarray([True, False]))
    b = np.asarray(out.bounds)
    assert np.isclose(b[0, 1], 1.0, atol=1e-5)  # not 0.5


def test_full_sdf_loss_branches():
    sdf = jnp.asarray([0.5, -0.1])
    target = jnp.asarray([0.3, 0.2])
    free, trunc = L.full_sdf_loss(sdf, target)
    assert np.isclose(float(free[0]), 0.2, atol=1e-6)           # relu branch
    assert np.isclose(float(free[1]), np.exp(0.5) - 1, atol=1e-5)  # exp branch
    assert np.allclose(np.asarray(trunc), [0.2, -0.3], atol=1e-6)


def test_sdf_loss_split_and_types():
    sdf = jnp.asarray([[0.5, 0.1]])
    bounds = jnp.asarray([[0.4, 0.05]])  # col0 free space (b > t), col1 trunc
    mat, fs = L.sdf_loss(sdf, bounds, trunc_distance=0.3, loss_type="L1")
    assert np.array_equal(np.asarray(fs), [[True, False]])
    assert np.allclose(np.asarray(mat), [[0.1, 0.05]], atol=1e-6)
    mat2, _ = L.sdf_loss(sdf, bounds, trunc_distance=0.3, loss_type="L2")
    assert np.allclose(np.asarray(mat2), [[0.1 ** 2, 0.05 ** 2]], atol=1e-7)


def test_tot_loss_weights_and_masking():
    sdf_mat = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    fs = jnp.asarray([[True, False], [True, True]])
    bounds = jnp.asarray([[0.5, 0.05], [0.5, 0.5]])
    eik = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
    valid = jnp.asarray([True, False])   # ray 1 fully masked

    out = L.tot_loss(sdf_mat, None, eik, fs, bounds, valid,
                     eik_apply_dist=0.1, trunc_weight=5.0,
                     grad_weight=0.0, eik_weight=0.5)
    # ray0: sdf terms [1, 2*5]; eik active only where bounds >= 0.1 -> [0.5, 0]
    want_total = (1.0 + 10.0 + 0.5 + 0.0) / 2.0
    assert np.isclose(float(out.total), want_total, atol=1e-6)
    assert np.isclose(float(out.scalars["sdf_loss"]), (1 + 10) / 2, atol=1e-6)
    assert np.isclose(float(out.scalars["eikonal_loss"]), 0.25, atol=1e-6)
    # masked ray contributes nothing
    assert np.allclose(np.asarray(out.mat[1]), 0.0)


def test_grad_cosine_loss_assembly():
    # predicted grad equals the normal at the surface sample -> zero loss
    sdf_grad = jnp.asarray([[[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]])
    grad_vec = jnp.asarray([[[1.0, 0.0, 0.0]]])
    normals = jnp.asarray([[0.0, 0.0, 1.0]])
    mat = L.grad_cosine_loss(sdf_grad, grad_vec, None, normals)
    assert mat.shape == (1, 2)
    assert np.allclose(np.asarray(mat), [[0.0, 0.0]], atol=1e-5)
    # degenerate grad_vec replaced by the normal
    mat2 = L.grad_cosine_loss(
        sdf_grad, grad_vec, jnp.asarray([[False]]), normals)
    # sample 1 target becomes normal (0,0,1) vs pred (1,0,0) -> loss 1
    assert np.isclose(float(mat2[0, 1]), 1.0, atol=1e-5)


def test_frame_avg_loss_blocks():
    # 2 frames, 16x16 image, factor 2 -> 4 blocks/frame
    ray_loss = jnp.asarray([1.0, 3.0, 2.0, 100.0])
    valid = jnp.asarray([True, True, True, False])
    ib = jnp.asarray([0, 0, 1, 1])
    ih = jnp.asarray([0, 0, 12, 12])   # frame0 both in block (0,0)
    iw = jnp.asarray([1, 2, 3, 3])     # frame1 in block (1,0)
    la, fa = L.frame_avg_loss(ray_loss, valid, ib, ih, iw,
                              n_frames=2, H=16, W=16, factor=2)
    assert la.shape == (2, 2, 2)
    assert np.isclose(float(la[0, 0, 0]), 2.0)     # (1+3)/2
    assert np.isclose(float(la[1, 1, 0]), 2.0)     # invalid ray excluded
    assert np.isclose(float(fa[0]), 2.0 / 4)
    assert np.isclose(float(fa[1]), 2.0 / 4)


def test_masked_mean():
    x = jnp.asarray([1.0, 2.0, 3.0])
    m = jnp.asarray([True, False, True])
    assert np.isclose(float(L.masked_mean(x, m)), 2.0)
    assert np.isclose(float(L.masked_mean(x, jnp.zeros(3, bool))), 0.0)
