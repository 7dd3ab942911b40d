"""GT SDF grid tooling (reference: isdf/datasets/sdf_util.py).

Grid IO in the reference's formats, scipy + JAX trilinear interpolators
with the same out-of-bounds handling modes, SDF colormap, and mesh->SDF
generation (voxel occupancy + double EDT) built on our own mesh layer
(utils/mesh3d) since trimesh is unavailable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage
from scipy.interpolate import RegularGridInterpolator


# ---------------------------------------------------------------------------
# grid IO (reference sdf_util.py:21-96)
# ---------------------------------------------------------------------------

def read_sdf_npy(path: str) -> np.ndarray:
    return np.load(path)


def read_sdf_binary(path: str, dims) -> np.ndarray:
    """Flat float32 binary dump ordered x-major (gpufusion style)."""
    grid = np.fromfile(path, dtype=np.float32)
    return grid.reshape(dims)

def read_sdf_habitat_txt(path: str) -> np.ndarray:
    """habitat-sim text dump: first line dims, then flat values."""
    with open(path) as f:
        dims = [int(x) for x in f.readline().split()]
        vals = np.loadtxt(f, dtype=np.float32)
    return vals.reshape(dims)


def read_sdf_gpufusion(sdf_file: str, transform_file: str):
    """GPU-fusion (KinectFusion+) SDF: text grid + header transform of
    'dims', 'voxel size', 'offset' lines (reference sdf_util.py:70-85)."""
    with open(transform_file) as f:
        dims = [int(e) for e in f.readline().split()[1:]]
        vsm = [float(e) for e in f.readline().split()[1:]]
        offset = [float(e) for e in f.readline().split()[1:]]
    transform = np.eye(4)
    transform[:3, 3] = offset
    transform[np.diag_indices_from(transform[:3, :3])] = vsm
    sdf = np.loadtxt(sdf_file).reshape(dims)
    return sdf, transform


def load_transform_txt(path: str) -> np.ndarray:
    return np.loadtxt(path).astype(np.float32).reshape(4, 4)


def merge_sdfs(grids) -> np.ndarray:
    """Compose scene SDF as the min over component SDFs
    (reference sdf_util.py:98-148 / replicaCAD_gt_sdf.py:81-144)."""
    out = grids[0]
    for g in grids[1:]:
        out = np.minimum(out, g)
    return out


# ---------------------------------------------------------------------------
# interpolation (reference sdf_util.py:174-273)
# ---------------------------------------------------------------------------

def sdf_interpolator(sdf_grid: np.ndarray, transform: np.ndarray):
    """scipy RegularGridInterpolator in world coordinates.

    transform: voxel index -> world (axis-aligned scale + offset), the
    reference's 1cm/transform.txt convention (trainer.py:446-453)."""
    dims = sdf_grid.shape
    axes = [transform[i, i] * np.arange(dims[i]) + transform[i, 3]
            for i in range(3)]
    return RegularGridInterpolator(axes, sdf_grid, bounds_error=True)


def eval_sdf_interp(interp, pts, handle_oob: str = "except",
                    oob_val: float = 0.0):
    """OOB handling modes of the reference (sdf_util.py:174-216):
    except | mask (returns (vals, valid)) | fill (returns vals with
    oob_val)."""
    pts = np.asarray(pts).reshape(-1, 3)
    lo = np.array([g[0] for g in interp.grid])
    hi = np.array([g[-1] for g in interp.grid])
    inside = np.all((pts >= lo) & (pts <= hi), axis=-1)
    if handle_oob == "except":
        return interp(pts)
    safe = np.clip(pts, lo, hi)
    vals = interp(safe)
    if handle_oob == "mask":
        return vals, inside
    if handle_oob == "fill":
        return np.where(inside, vals, oob_val)
    raise ValueError(handle_oob)


def trilinear_interp_jax(grid, transform):
    """Device-resident trilinear SDF interpolator: pts [N,3] -> [N].

    The TPU-native counterpart of the scipy path — usable inside jitted
    eval, e.g. for dense GT comparisons without host round-trips.
    Clamps to the grid boundary (matching 'fill'-at-edge semantics)."""
    grid = jnp.asarray(grid)
    inv_scale = jnp.asarray([1.0 / transform[i, i] for i in range(3)])
    offset = jnp.asarray([transform[i, 3] for i in range(3)])
    dims = jnp.asarray(grid.shape)

    @jax.jit
    def interp(pts):
        idx = (pts - offset) * inv_scale
        idx = jnp.clip(idx, 0.0, dims.astype(jnp.float32) - 1.0 - 1e-6)
        i0 = jnp.floor(idx).astype(jnp.int32)
        frac = idx - i0
        i1 = jnp.minimum(i0 + 1, dims - 1)

        def at(ix, iy, iz):
            return grid[ix, iy, iz]

        c = 0.0
        for dx, wx in ((i0[:, 0], 1 - frac[:, 0]), (i1[:, 0], frac[:, 0])):
            for dy, wy in ((i0[:, 1], 1 - frac[:, 1]),
                           (i1[:, 1], frac[:, 1])):
                for dz, wz in ((i0[:, 2], 1 - frac[:, 2]),
                               (i1[:, 2], frac[:, 2])):
                    c = c + wx * wy * wz * at(dx, dy, dz)
        return c

    return interp


# ---------------------------------------------------------------------------
# colormap (reference sdf_util.py:276-306)
# ---------------------------------------------------------------------------

def get_colormap(sdf_range=(-2.0, 2.0), surface_cutoff: float = 0.01):
    """Callable pts-sdf -> RGBA float [0,1], diverging with a surface
    band, mirroring the reference's matplotlib colormap object usage."""
    import matplotlib
    import matplotlib.colors as mcolors

    norm = mcolors.TwoSlopeNorm(vmin=sdf_range[0], vcenter=0.0,
                                vmax=sdf_range[1])
    cmap = matplotlib.colormaps["RdBu"]

    class _CM:
        def to_rgba(self, vals, alpha=1.0, bytes=False):
            rgba = cmap(norm(np.asarray(vals)))
            band = np.abs(np.asarray(vals)) < surface_cutoff
            rgba[band] = np.array([0.0, 1.0, 0.0, 1.0])
            rgba[..., 3] = alpha
            if bytes:
                rgba = (rgba * 255).astype(np.uint8)
            return rgba

    return _CM()


# ---------------------------------------------------------------------------
# mesh -> SDF (reference sdf_util.py:312-457)
# ---------------------------------------------------------------------------

def mesh_to_occupancy(verts, faces, dims, transform,
                      samples_per_area: float = 2000.0) -> np.ndarray:
    """Voxel occupancy by dense surface sampling (stand-in for the
    reference's trimesh voxelise-subdivide, sdf_util.py:312-368)."""
    from isdf_tpu.utils import mesh3d

    rng = np.random.default_rng(0)
    area = mesh3d.face_areas(verts, faces).sum()
    n = int(min(max(area * samples_per_area, 10000), 4_000_000))
    pts = mesh3d.sample_surface(verts, faces, n, rng)
    idx = (pts - transform[:3, 3]) / np.diag(transform)[:3]
    idx = np.round(idx).astype(int)
    ok = np.all((idx >= 0) & (idx < np.asarray(dims)), axis=-1)
    occ = np.zeros(dims, bool)
    occ[tuple(idx[ok].T)] = True
    return occ


def occupancy_to_sdf(occ: np.ndarray, voxel_size: float,
                     inside_mask=None) -> np.ndarray:
    """Unsigned distance via two EDTs, signed by an inside mask
    (reference sdf_util.py:371-385)."""
    outside_d = ndimage.distance_transform_edt(~occ) * voxel_size
    if inside_mask is None:
        return outside_d
    sdf = np.where(inside_mask, -outside_d, outside_d)
    return sdf


def mesh_to_sdf(verts, faces, dims, transform) -> np.ndarray:
    """Dense SDF of a closed mesh on the given grid. Sign via flood fill
    from the grid boundary (outside = reachable)."""
    occ = mesh_to_occupancy(verts, faces, dims, transform)
    # flood-fill outside region
    free = ~occ
    labels, _ = ndimage.label(free)
    border_labels = np.unique(np.concatenate([
        labels[0].ravel(), labels[-1].ravel(),
        labels[:, 0].ravel(), labels[:, -1].ravel(),
        labels[:, :, 0].ravel(), labels[:, :, -1].ravel()]))
    outside = np.isin(labels, border_labels[border_labels != 0])
    inside = free & ~outside
    voxel = float(transform[0, 0])
    return occupancy_to_sdf(occ, voxel, inside_mask=inside)
