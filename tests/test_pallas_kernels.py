"""Pallas kernels tested in interpreter mode (CPU) against XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import bounds as B
from isdf_tpu.ops.pallas.bounds_pc import closest_surface_ix


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
