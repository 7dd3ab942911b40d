import numpy as np
import pytest

from isdf_tpu.utils import mesh3d


def sphere_grid(dim=48, r=1.0, half=1.5):
    ax = np.linspace(-half, half, dim, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r
    spacing = (2 * half / (dim - 1),) * 3
    origin = (-half,) * 3
    return sdf, spacing, origin


def test_marching_tets_sphere():
    sdf, spacing, origin = sphere_grid()
    v, f = mesh3d.marching_tetrahedra(sdf, 0.0, spacing, origin)
    assert len(v) > 500 and len(f) > 500
    r = np.linalg.norm(v, axis=1)
    # all vertices on the unit sphere (within grid resolution)
    assert abs(r.mean() - 1.0) < 0.01
    assert np.abs(r - 1.0).max() < 0.08
    # total area close to 4*pi
    area = mesh3d.face_areas(v, f).sum()
    assert abs(area - 4 * np.pi) < 0.5


def test_marching_tets_empty():
    sdf = np.ones((8, 8, 8), np.float32)
    v, f = mesh3d.marching_tetrahedra(sdf)
    assert len(v) == 0 and len(f) == 0


def test_sample_surface_on_sphere():
    sdf, spacing, origin = sphere_grid()
    v, f = mesh3d.marching_tetrahedra(sdf, 0.0, spacing, origin)
    pts = mesh3d.sample_surface(v, f, 5000, np.random.default_rng(0))
    assert pts.shape == (5000, 3)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 1.0) < 0.02
    # roughly uniform: centroid near origin
    assert np.abs(pts.mean(axis=0)).max() < 0.05


def test_crop_mesh_near_pc():
    sdf, spacing, origin = sphere_grid()
    v, f = mesh3d.marching_tetrahedra(sdf, 0.0, spacing, origin)
    # keep only the x>0 hemisphere
    pc = mesh3d.sample_surface(v, f, 2000, np.random.default_rng(1))
    pc = pc[pc[:, 0] > 0.3]
    v2, f2 = mesh3d.crop_mesh_near_pc(v, f, pc, crop_dist=0.3)
    assert len(f2) < len(f)
    assert (v2[f2.reshape(-1)][:, 0] > -0.4).mean() > 0.95


def test_ply_roundtrip(tmp_path):
    sdf, spacing, origin = sphere_grid(dim=16)
    v, f = mesh3d.marching_tetrahedra(sdf, 0.0, spacing, origin)
    p = str(tmp_path / "m.ply")
    mesh3d.write_ply(p, v, f)
    v2, f2 = mesh3d.read_ply(p)
    assert np.allclose(v, v2, atol=1e-6)
    assert np.array_equal(f, f2)


def test_obj_reader(tmp_path):
    p = str(tmp_path / "m.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                 "f 1 2 3\nf 1 2 3 4\n")  # tri + quad (triangulated)
    v, f = mesh3d.read_obj(p)
    assert v.shape == (4, 3)
    assert f.shape == (3, 3)
    assert f[1].tolist() == [0, 1, 2] and f[2].tolist() == [0, 2, 3]


def test_orient_faces_outward():
    sdf, spacing, origin = sphere_grid()
    v, f = mesh3d.marching_tetrahedra(sdf, 0.0, spacing, origin)
    f2 = mesh3d.orient_faces_outward(
        v, f, lambda p: np.linalg.norm(p, axis=-1) - 1.0)
    v0, v1, v2 = v[f2[:, 0]], v[f2[:, 1]], v[f2[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    c = (v0 + v1 + v2) / 3
    # normals point away from the centre
    assert ((n * c).sum(-1) > 0).mean() > 0.99
