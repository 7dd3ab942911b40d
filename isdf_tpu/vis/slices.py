"""SDF slice images (reference: trainer.py:1558-1759, sdf_util colormap).

Horizontal (up-axis) slices through the scene grid, colourised with the
reference's diverging surface-highlight colormap, written as PNGs with the
reference's file naming so downstream figure tooling can consume them.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def sdf_colormap(sdf: np.ndarray, sdf_range=(-2.0, 2.0)) -> np.ndarray:
    """RGB uint8 colourisation of SDF values.

    Matches the intent of the reference colormap (sdf_util.py:276-306):
    diverging red (inside) -> white near the surface -> blue (far free
    space), with a sharp band at zero."""
    import matplotlib
    import matplotlib.colors as mcolors

    norm = mcolors.TwoSlopeNorm(vmin=sdf_range[0], vcenter=0.0,
                                vmax=sdf_range[1])
    rgba = matplotlib.colormaps["RdBu"](norm(np.asarray(sdf)))
    return (rgba[..., :3] * 255).astype(np.uint8)


def to_topdown(trainer, pts: np.ndarray, im_size) -> np.ndarray:
    """World points -> top-down slice pixel coords
    (reference trainer.py:1761-1773)."""
    up_ix = getattr(trainer, "up_ix", 1)
    homog = np.concatenate([pts, np.ones((len(pts), 1))], axis=-1)
    inv_bt = trainer.inv_bounds_transform_np
    td = (homog @ inv_bt.T)[:, :3] / trainer.scene_scale_np
    td = td / 2 + 0.5
    td = np.concatenate([td[:, :up_ix], td[:, up_ix + 1:]], axis=1)
    return (td * np.asarray(im_size)).astype(int)


def draw_agent(im: np.ndarray, pos_px, rotation: float = 0.0,
               radius_px: int = 8):
    """Triangle agent marker (reference visualisation/draw.py:13-136)."""
    c, s = np.cos(rotation), np.sin(rotation)
    R = np.array([[c, -s], [s, c]])
    tri = np.array([[0, -1.2], [0.8, 0.9], [-0.8, 0.9]]) * radius_px
    tri = (tri @ R.T + np.asarray(pos_px)[::-1]).astype(np.int32)
    cv2.fillPoly(im, [tri], (220, 30, 30))
    return im


def draw_cams_on_slices(trainer, slice_imgs: List[np.ndarray]):
    """Overlay trajectory + camera markers on each slice
    (reference trainer.py:1673-1705)."""
    if len(trainer.frames) == 0:
        return slice_imgs
    T = trainer.frames.T_WC_batch_np()
    im_size = slice_imgs[0].shape[:2][::-1]
    cam_td = to_topdown(trainer, T[:, :3, 3], im_size)
    angs = [float(np.arctan2(r[0, 2], r[0, 0])) for r in T[:, :3, :3]]
    out = []
    for im in slice_imgs:
        im = np.ascontiguousarray(im)
        for j in range(len(cam_td) - 1):
            if not (cam_td[j] == cam_td[j + 1]).all():
                cv2.line(im, tuple(cam_td[j][::-1]),
                         tuple(cam_td[j + 1][::-1]), (255, 0, 0), 1)
        for p, a in zip(cam_td, angs):
            draw_agent(im, p, rotation=a)
        out.append(im)
    return out


def compute_slices(trainer, n_slices: int = 6, include_gt: bool = False,
                   include_diff: bool = False, draw_cams: bool = False,
                   sdf_range=(-2.0, 2.0)) -> Dict[str, List[np.ndarray]]:
    """Query the model on n_slices planes of the eval grid and colourise.

    The up axis is assumed to be the grid's second axis (y) unless the
    trainer provides ``up_ix``; planes at linspace(30, dim-30) like the
    reference (trainer.py:1564-1566).
    """
    dim = trainer.grid_dim
    up_ix = getattr(trainer, "up_ix", 1)
    z_ixs = np.round(np.linspace(30, dim - 30, n_slices)).astype(int)
    z_ixs = np.clip(z_ixs, 0, dim - 1)

    grid = np.asarray(trainer.grid_pc).reshape(dim, dim, dim, 3)
    pc = np.take(grid, z_ixs, axis=up_ix)          # slice planes
    flat = pc.reshape(-1, 3)
    sdf = trainer.sdf_fn(flat)

    out: Dict[str, List[np.ndarray]] = {"pred_sdf": []}
    sdf_img = sdf_colormap(sdf.reshape(pc.shape[:-1]), sdf_range)
    for i in range(n_slices):
        out["pred_sdf"].append(np.take(sdf_img, i, axis=up_ix))
    if draw_cams:
        out["pred_sdf"] = draw_cams_on_slices(trainer, out["pred_sdf"])

    if include_gt and trainer.gt_sdf_fn is not None:
        gt = np.asarray(trainer.gt_sdf_fn(flat)).reshape(pc.shape[:-1])
        gt_img = sdf_colormap(gt, sdf_range)
        out["gt_sdf"] = [np.take(gt_img, i, axis=up_ix)
                         for i in range(n_slices)]
        if include_diff:
            diff = np.abs(gt - sdf.reshape(pc.shape[:-1]))
            dmin, dmax = 0.0, 0.5
            dn = np.clip((diff - dmin) / (dmax - dmin), 0, 1)
            import matplotlib
            dimg = (matplotlib.colormaps["viridis"](dn)[..., :3] * 255).astype(np.uint8)
            out["diff"] = [np.take(dimg, i, axis=up_ix)
                           for i in range(n_slices)]
    return out


def write_slices(trainer, save_path: str, prefix: str = "",
                 n_slices: int = 6, include_gt: bool = False,
                 include_diff: bool = False, draw_cams: bool = False,
                 sdf_range=(-2.0, 2.0)):
    """PNG writer with the reference's naming (trainer.py:1709-1742)."""
    sl = compute_slices(trainer, n_slices, include_gt, include_diff,
                        draw_cams, sdf_range)
    os.makedirs(save_path, exist_ok=True)
    for s in range(n_slices):
        cv2.imwrite(os.path.join(save_path, f"{prefix}pred_{s}.png"),
                    sl["pred_sdf"][s][..., ::-1])
        if "gt_sdf" in sl:
            cv2.imwrite(os.path.join(save_path, f"{prefix}gt_{s}.png"),
                        sl["gt_sdf"][s][..., ::-1])
        if "diff" in sl:
            cv2.imwrite(os.path.join(save_path, f"{prefix}diff_{s}.png"),
                        sl["diff"][s][..., ::-1])
    return sl
