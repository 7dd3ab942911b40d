"""Fixed-capacity device-resident keyframe arena.

The reference grows torch tensors by concatenation every keyframe
(isdf/datasets/data_util.py:45-102) and indexes them with numpy each step.
On TPU that would mean a reshape/realloc + host sync per keyframe and
dynamic shapes everywhere. Instead the buffer is a static pytree of
device arrays with a fill count; "append or replace last" becomes a
dynamic_update at a computed row. All step-time access is by gather, so the
whole optimisation bundle stays on device.

RGB images are intentionally NOT stored on device — they are only used for
visualisation, which is host-side (the host FrameStore keeps numpy copies).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class FrameBuffer(NamedTuple):
    depth: jnp.ndarray           # [C, H, W]
    T_WC: jnp.ndarray            # [C, 4, 4]
    normals: Optional[jnp.ndarray]  # [C, H, W, 3] or None (if not do_normal)
    frame_avg_loss: jnp.ndarray  # [C]
    loss_approx: jnp.ndarray     # [C, f, f] block-pooled loss image (the
    #   reference's loss_approx, loss.py:208-218 — drives active sampling)
    frame_id: jnp.ndarray        # [C] int32 (dataset frame index)
    count: jnp.ndarray           # scalar int32, number of stored frames

    @property
    def capacity(self) -> int:
        return self.depth.shape[0]


def make_buffer(capacity: int, H: int, W: int,
                with_normals: bool = True, factor: int = 8) -> FrameBuffer:
    return FrameBuffer(
        depth=jnp.zeros((capacity, H, W), jnp.float32),
        T_WC=jnp.zeros((capacity, 4, 4), jnp.float32),
        normals=(jnp.zeros((capacity, H, W, 3), jnp.float32)
                 if with_normals else None),
        frame_avg_loss=jnp.zeros((capacity,), jnp.float32),
        loss_approx=jnp.zeros((capacity, factor, factor), jnp.float32),
        frame_id=jnp.full((capacity,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("keep_recent",))
def evict_lowest_priority(buf: FrameBuffer,
                          keep_recent: int = 2) -> FrameBuffer:
    """Drop the lowest-replay-priority old keyframe, compacting in order.

    The reference's buffer grows without bound (data_util.py:45-78); a
    fixed device arena instead evicts the older keyframe with the lowest
    running average loss — the same signal the replay window samples by
    (trainer.py:652-674), so the evicted frame is the one the policy was
    least likely to ever select. The ``keep_recent`` newest frames are
    never evicted (the window always contains them).
    """
    C = buf.capacity
    idx = jnp.arange(C)
    pool = idx < (buf.count - keep_recent)
    prio = jnp.where(pool, buf.frame_avg_loss, jnp.inf)
    victim = jnp.argmin(prio)
    perm = jnp.where(idx < victim, idx, jnp.minimum(idx + 1, C - 1))

    buf = buf._replace(
        depth=buf.depth[perm],
        T_WC=buf.T_WC[perm],
        frame_avg_loss=buf.frame_avg_loss[perm],
        loss_approx=buf.loss_approx[perm],
        frame_id=buf.frame_id[perm].at[C - 1].set(-1),
        count=buf.count - 1,
    )
    if buf.normals is not None:
        buf = buf._replace(normals=buf.normals[perm])
    return buf


@functools.partial(jax.jit, donate_argnums=(0,))
def add_frame(buf: FrameBuffer, depth, T_WC, normals, frame_id,
              replace) -> FrameBuffer:
    """Append a frame, or overwrite the newest row if ``replace``.

    Semantics of reference add_data (trainer.py:564-572): a non-keyframe
    latest frame is replaced by the incoming frame. ``replace`` is a traced
    bool so keyframe promotion does not recompile. Writing past capacity
    clamps to the last row (callers check count < capacity on host).
    """
    row = jnp.where(replace, buf.count - 1, buf.count)
    row = jnp.clip(row, 0, buf.capacity - 1)
    new_count = jnp.where(replace, buf.count, buf.count + 1)
    new_count = jnp.minimum(new_count, buf.capacity)

    buf = buf._replace(
        depth=jax.lax.dynamic_update_index_in_dim(
            buf.depth, depth.astype(buf.depth.dtype), row, 0),
        T_WC=jax.lax.dynamic_update_index_in_dim(
            buf.T_WC, T_WC.astype(buf.T_WC.dtype), row, 0),
        frame_avg_loss=buf.frame_avg_loss.at[row].set(0.0),
        loss_approx=buf.loss_approx.at[row].set(0.0),
        frame_id=buf.frame_id.at[row].set(jnp.int32(frame_id)),
        count=new_count,
    )
    if buf.normals is not None:
        buf = buf._replace(normals=jax.lax.dynamic_update_index_in_dim(
            buf.normals, normals.astype(buf.normals.dtype), row, 0))
    return buf
