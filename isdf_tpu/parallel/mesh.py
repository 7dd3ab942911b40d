"""Device-mesh utilities — data parallelism over the ray batch.

The reference is strictly single-device (SURVEY.md section 2.9: no
torch.distributed / NCCL anywhere); scaling out is an additive capability
here. The natural axis for iSDF is the per-step ray batch: params and the
keyframe arena are replicated, rays are sharded over the "dp" mesh axis,
and XLA/GSPMD inserts the psum for gradient reduction and the all-gather
that the batch-distance bounds method needs (every ray's samples are
compared against every ray's surface point). All collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def ray_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_rays(mesh: Optional[Mesh], *arrays, axis: str = "dp"):
    """Apply a leading-axis sharding constraint to each array (no-op when
    mesh is None). Rays = window_size * n_rays must divide the mesh size."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    s = ray_sharding(mesh, axis)
    out = tuple(jax.lax.with_sharding_constraint(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
