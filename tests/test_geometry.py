import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.ops import geometry as g


def test_ray_dirs_C_z_convention():
    H, W, fx, fy, cx, cy = 4, 6, 10.0, 12.0, 2.5, 1.5
    dirs = np.asarray(g.ray_dirs_C(H, W, fx, fy, cx, cy))
    assert dirs.shape == (H, W, 3)
    # z component is exactly 1 everywhere
    assert np.allclose(dirs[..., 2], 1.0)
    # pixel (r, c): x = (c - cx)/fx, y = (r - cy)/fy
    assert np.isclose(dirs[1, 3, 0], (3 - cx) / fx)
    assert np.isclose(dirs[1, 3, 1], (1 - cy) / fy)


def test_ray_dirs_C_euclidean_unit_norm():
    dirs = np.asarray(g.ray_dirs_C(4, 6, 10.0, 12.0, 2.5, 1.5,
                                   depth_type="euclidean"))
    assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)


def test_origin_dirs_W_matches_manual():
    rng = np.random.default_rng(0)
    T = np.eye(4, dtype=np.float32)
    # rotation about z by 90 deg, translation (1,2,3)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = [1, 2, 3]
    dirs_C = rng.normal(size=(5, 3)).astype(np.float32)
    origins, dirs_W = g.origin_dirs_W(jnp.asarray(T)[None], jnp.asarray(dirs_C))
    expect = dirs_C @ T[:3, :3].T
    assert np.allclose(np.asarray(dirs_W), expect, atol=1e-6)
    assert np.allclose(np.asarray(origins), T[:3, 3])


def test_backproject_roundtrip():
    H, W, fx, fy, cx, cy = 8, 10, 20.0, 20.0, 4.5, 3.5
    rng = np.random.default_rng(1)
    depth = rng.uniform(0.5, 3.0, size=(H, W)).astype(np.float32)
    pc = np.asarray(g.pointcloud_from_depth(jnp.asarray(depth), fx, fy, cx, cy))
    # reproject: u = fx*x/z + cx must recover the pixel coords
    u = fx * pc[..., 0] / pc[..., 2] + cx
    v = fy * pc[..., 1] / pc[..., 2] + cy
    cc, rr = np.meshgrid(np.arange(W), np.arange(H))
    assert np.allclose(u, cc, atol=1e-4)
    assert np.allclose(v, rr, atol=1e-4)
    assert np.allclose(pc[..., 2], depth)


def test_normals_flat_plane():
    # camera looking straight at a plane z=2: normals must be (0,0,-1)-ish
    H, W, f = 16, 16, 20.0
    depth = np.full((H, W), 2.0, np.float32)
    pc = g.pointcloud_from_depth(jnp.asarray(depth), f, f, W / 2, H / 2)
    normals = np.asarray(g.estimate_pointcloud_normals(pc))
    inner = normals[4:-4, 4:-4]
    # sign convention: cross(p2-p1, p3-p1) for anticlockwise lookups
    assert np.allclose(np.abs(inner[..., 2]), 1.0, atol=1e-3)
    assert np.allclose(inner[..., 0], 0.0, atol=1e-3)


def test_normals_nan_border():
    H, W, f = 12, 12, 20.0
    depth = np.full((H, W), 2.0, np.float32)
    depth[0:3] = np.nan
    pc = g.pointcloud_from_depth(jnp.asarray(depth), f, f, W / 2, H / 2)
    normals = np.asarray(g.estimate_pointcloud_normals(pc))
    # NaN region propagates NaN normals; valid interior stays valid
    assert np.isnan(normals[0]).all()
    assert not np.isnan(normals[6:10, 4:8]).any()


def test_make_3D_grid_transform():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, -1.0, 0.5]
    scale = jnp.asarray([2.0, 1.0, 0.5])
    grid = np.asarray(g.make_3D_grid((-1, 1), 3, transform=jnp.asarray(T),
                                     scale=scale))
    assert grid.shape == (3, 3, 3, 3)
    # centre of grid maps to the translation
    assert np.allclose(grid[1, 1, 1], T[:3, 3], atol=1e-6)
    # corner (-1,-1,-1) -> scale*(-1,-1,-1) + t
    assert np.allclose(grid[0, 0, 0], np.array([-2, -1, -0.5]) + T[:3, 3],
                       atol=1e-6)


def test_oriented_bounds_axis_aligned_box():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(2000, 3)) * np.array([3.0, 1.0, 0.5])
    pts += np.array([10.0, -5.0, 2.0])
    T, extents = g.oriented_bounds(pts)
    # transform moves centroid to origin
    centred = (np.c_[pts, np.ones(len(pts))] @ T.T)[:, :3]
    assert np.abs(centred.mean(axis=0)).max() < 0.1
    assert np.allclose(np.sort(extents), np.sort([6.0, 2.0, 1.0]), atol=0.1)


def test_look_at_points_camera_at_target():
    R, t = g.look_at(np.array([1.0, 1.0, 1.0]), np.zeros(3),
                     up=np.array([0.0, 1.0, 0.0]))
    z = R[:, 2]
    expect = -np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    assert np.allclose(z, expect, atol=1e-6)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
