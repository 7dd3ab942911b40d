"""Positional encodings for the SDF MLP input.

Two encoders:
  * icosahedron sinusoidal PE — project the (scene-normalised, scaled) xyz
    onto the 21 unit directions through the vertices/edge-midpoints of half
    an icosahedron, multiply by 2^k frequency bands, take sin and the
    pi/2-phase-shifted sin (== cos), and concatenate the scaled coords.
    Matches the reference encoder (isdf/modules/embedding.py:25-111),
    embedding size 2*21*n_freqs + 3.
  * Gaussian random-Fourier-feature embedding — the reference declares this
    option in configs but its forward path is unimplemented
    (embedding.py:74-93 references a missing attr); here it works.

Both are pure functions of the input; the fixed projection matrix is a
compile-time constant folded into the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 21 unit directions: vertices + edge midpoints of a half icosahedron
# (standard golden-ratio construction; same direction set as the reference,
# isdf/modules/embedding.py:40-62).
ICOSAHEDRON_DIRS = np.array([
    [0.8506508, 0.0, 0.5257311],
    [0.809017, 0.5, 0.309017],
    [0.5257311, 0.8506508, 0.0],
    [1.0, 0.0, 0.0],
    [0.809017, 0.5, -0.309017],
    [0.8506508, 0.0, -0.5257311],
    [0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, -0.8506508],
    [0.5, 0.309017, -0.809017],
    [0.0, 1.0, 0.0],
    [-0.5257311, 0.8506508, 0.0],
    [-0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, 0.8506508],
    [-0.309017, 0.809017, 0.5],
    [0.309017, 0.809017, 0.5],
    [0.5, 0.309017, 0.809017],
    [0.5, -0.309017, 0.809017],
    [0.0, 0.0, 1.0],
    [-0.5, 0.309017, 0.809017],
    [-0.809017, 0.5, 0.309017],
    [-0.809017, 0.5, -0.309017],
], dtype=np.float32)  # [21, 3]


def n_freqs(min_deg: int, max_deg: int) -> int:
    return max_deg - min_deg + 1


def embedding_size(min_deg: int = 0, max_deg: int = 5) -> int:
    return 2 * ICOSAHEDRON_DIRS.shape[0] * n_freqs(min_deg, max_deg) + 3


def scale_input(x, transform=None, scale=None):
    """Map world coords into the normalised scene frame then scale.

    Reference: isdf/modules/embedding.py:12-22 (transform applied as a
    rigid transform, then multiplicative scale).
    """
    if transform is not None:
        R = transform[:3, :3]
        t = transform[:3, 3]
        x = jnp.einsum("ij,...j->...i", R, x,
                      precision=jax.lax.Precision.HIGHEST) + t
    if scale is not None:
        x = x * scale
    return x


def positional_encoding(
    x,
    transform=None,
    scale: float = 1.0,
    min_deg: int = 0,
    max_deg: int = 5,
):
    """Icosahedron-direction sinusoidal embedding.

    x: [..., 3] world coordinates. Returns [..., 2*21*n_freqs + 3].

    Layout matches the reference exactly (embedding.py:95-111):
    [scaled_xyz, sin(proj * 2^k) interleaved (dir-major, freq-minor),
     sin(proj * 2^k + pi/2)].
    """
    nf = n_freqs(min_deg, max_deg)
    bands = 2.0 ** jnp.linspace(min_deg, max_deg, nf).astype(x.dtype)

    xs = scale_input(x, transform=transform, scale=scale)
    # full-f32 projection: bf16 MXU default would put O(4e-3) phase error
    # into sin(2^k * proj) which the high frequency bands amplify
    proj = jnp.matmul(xs, jnp.asarray(ICOSAHEDRON_DIRS.T, dtype=x.dtype),
                      precision=jax.lax.Precision.HIGHEST)  # [..., 21]
    xb = (proj[..., None] * bands).reshape(*proj.shape[:-1], -1)  # [..., 21*nf]
    emb = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    return jnp.concatenate([xs, emb], axis=-1)


def init_gaussian_embedding(key, std: float = 11.0, n_feats: int = 126):
    """Random Fourier feature matrix B ~ N(0, std^2), shape [3, n_feats]."""
    return std * jax.random.normal(key, (3, n_feats), dtype=jnp.float32)


def gaussian_encoding(x, B, transform=None, scale: float = 1.0):
    """Gaussian RFF embedding: [scaled_xyz, sin(2*pi*xB), cos(2*pi*xB)].

    Working replacement for the reference's unimplemented gauss_embed
    option (isdf/modules/embedding.py:74-93).
    """
    xs = scale_input(x, transform=transform, scale=scale)
    proj = 2.0 * jnp.pi * jnp.matmul(
        xs, B.astype(x.dtype), precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([xs, jnp.sin(proj), jnp.cos(proj)], axis=-1)
