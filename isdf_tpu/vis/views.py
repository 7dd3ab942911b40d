"""2-D visual monitors (reference: trainer.py:1020-1150 latest_frame_vis /
frames_vis, visualisation/draw.py).

Headless-first: every function returns uint8 images (and can write them);
no GUI toolkit dependency. These cover the reference's cv2 windows
(keyframe strip, latest frame rgb/depth vs rendered normals/depth).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def depth_to_rgb(depth: np.ndarray, max_depth: Optional[float] = None
                 ) -> np.ndarray:
    """Colourised depth (imgviz.depth2rgb stand-in)."""
    import matplotlib
    d = np.asarray(depth, np.float32)
    valid = d > 0
    md = max_depth or (d[valid].max() if valid.any() else 1.0)
    dn = np.clip(d / max(md, 1e-6), 0, 1)
    img = (matplotlib.colormaps["turbo"](dn)[..., :3] * 255).astype(np.uint8)
    img[~valid] = 0
    return img


def keyframe_strip(trainer, reduce_factor: int = 6,
                   max_frames: int = 12) -> np.ndarray:
    """Horizontal strip of keyframe rgbs (reference draw.py:139-150)."""
    ims = []
    for f in trainer.frames.frames[-max_frames:]:
        im = f.image
        if im is None:
            im = depth_to_rgb(f.depth)
        small = im[::reduce_factor, ::reduce_factor]
        ims.append(small)
    if not ims:
        return np.zeros((8, 8, 3), np.uint8)
    h = min(i.shape[0] for i in ims)
    return np.concatenate([i[:h] for i in ims], axis=1)


def latest_frame_vis(trainer, reduce_factor: int = 8,
                     n_strat: int = 40) -> np.ndarray:
    """2x2 panel: frame rgb + gt depth over rendered depth + normals
    (reference trainer.py:1055-1150), rendered through the current net at
    reduced resolution."""
    import jax
    import jax.numpy as jnp
    from isdf_tpu.ops import geometry as G
    from isdf_tpu.ops import render as R

    f = trainer.frames[-1]
    H, W = trainer.H // reduce_factor, trainer.W // reduce_factor
    depth_small = f.depth[::reduce_factor, ::reduce_factor][:H, :W]
    dirs = G.ray_dirs_C(H, W, trainer.fx / reduce_factor,
                        trainer.fy / reduce_factor,
                        trainer.cx / reduce_factor,
                        trainer.cy / reduce_factor).reshape(1, -1, 3)
    depth_flat = jnp.asarray(
        np.where(depth_small > 0, depth_small, 3.0).reshape(1, -1))
    rd = trainer.fns.render_depth(
        trainer.params, jnp.asarray(f.T_WC)[None], dirs, depth_flat,
        trainer.transform_dev, jax.random.PRNGKey(0), n_strat=n_strat)
    render_d = np.asarray(rd).reshape(H, W)

    def grad_fn(pc):
        return trainer.fns.eval_sdf_grad(trainer.params, pc,
                                         trainer.transform_dev)

    normals_C = R.render_normals_C(
        jnp.asarray(f.T_WC)[None, None], jnp.asarray(render_d.reshape(-1)),
        grad_fn, dirs.reshape(-1, 3))
    normals_img = ((np.asarray(normals_C).reshape(H, W, 3) + 1) * 127.5
                   ).astype(np.uint8)

    rgb = (f.image[::reduce_factor, ::reduce_factor][:H, :W]
           if f.image is not None else depth_to_rgb(depth_small))
    md = float(max(depth_small.max(), render_d.max(), 1e-3))
    top = np.concatenate([rgb, depth_to_rgb(depth_small, md)], axis=1)
    bottom = np.concatenate([normals_img, depth_to_rgb(render_d, md)],
                            axis=1)
    return np.concatenate([top, bottom], axis=0)


def save_view(img: np.ndarray, path: str):
    cv2.imwrite(path, img[..., ::-1])
