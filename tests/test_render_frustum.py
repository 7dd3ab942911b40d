import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import render as R
from isdf_tpu.ops import frustum as F


def test_render_depth_first_crossing():
    z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    sdf = jnp.asarray([[0.5, 0.1, -0.05, -1.0]])
    d = R.sdf_render_depth(z, sdf)
    # first inside sample is index 2: depth = 3.0 + (-0.05)
    assert np.isclose(float(d[0]), 2.95, atol=1e-6)


def test_render_depth_no_crossing_and_last_sample():
    z = jnp.asarray([[1.0, 2.0], [1.0, 2.0]])
    sdf = jnp.asarray([[0.5, 0.1], [0.5, -0.1]])
    d = np.asarray(R.sdf_render_depth(z, sdf))
    assert d[0] == 0.0          # no crossing
    assert d[1] == 0.0          # crossing only at last sample


def test_sort_by_z():
    z = jnp.asarray([[3.0, 1.0, 2.0]])
    s = jnp.asarray([[30.0, 10.0, 20.0]])
    zs, ss = R.sort_by_z(z, s)
    assert np.allclose(np.asarray(zs), [[1, 2, 3]])
    assert np.allclose(np.asarray(ss), [[10, 20, 30]])


def test_render_normals_sphere():
    # unit sphere at origin: grad = x/|x| so normals_C = -grad rotated
    T = jnp.eye(4)[None]
    depth = jnp.asarray([[2.0]])  # camera at origin looking +z... point (0,0,2)

    def grad_fn(pc):
        return pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)

    dirs_C = jnp.asarray([[[0.0, 0.0, 1.0]]])
    n = R.render_normals_C(T, depth, grad_fn, dirs_C)
    assert np.allclose(np.asarray(n[0, 0]), [0, 0, -1], atol=1e-3)


def test_is_visible_basic():
    H, W, f = 16, 16, 10.0
    depth = np.full((1, H, W), 2.0, np.float32)
    T = np.eye(4, dtype=np.float32)[None]
    pts = np.array([
        [0.0, 0.0, 1.0],    # in front of surface, centre -> visible
        [0.0, 0.0, 2.1],    # within trunc behind surface -> visible
        [0.0, 0.0, 2.5],    # too far behind -> not visible
        [0.0, 0.0, -1.0],   # behind camera -> not visible
        [10.0, 0.0, 1.0],   # projects outside image -> not visible
    ], np.float32)
    vis = np.asarray(F.is_visible(
        jnp.asarray(pts), jnp.asarray(T), jnp.asarray(depth),
        f, f, W / 2, H / 2, trunc=0.2))[0]
    assert vis.tolist() == [True, True, False, False, False]


def test_frustum_normals_inside_test():
    R_WC = jnp.eye(3)
    n = F.frustum_normals(R_WC, 16, 16, 10.0, 10.0, 8.0, 8.0)
    assert n.shape == (4, 3)
    inside = F.inside_frustum(
        jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0]]),
        jnp.zeros(3), n)
    assert np.asarray(inside).tolist() == [True, False]
