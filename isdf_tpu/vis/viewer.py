"""Interactive-ish SDF viewers (reference: isdf/visualisation/sdf_viewer.py,
isdf_window.py).

Open3D/pyglet are unavailable in this image, so the viewers are
matplotlib-based: usable interactively when a display exists, and able to
render the same content headlessly (PNG sequences / turntables). Covered
capabilities:
  * SDFSliceViewer — scrub through horizontal slices of an SDF grid with
    the surface-band colormap (SDFViewer's slice mode, sdf_viewer.py:66-498)
  * mesh_turntable — offscreen renders of the reconstructed mesh from a
    ring of viewpoints (draw3D.capture_scene_im, draw3D.py:163-172)
  * monitor — periodic composite of keyframe strip + latest-frame render +
    slice panel during training (the iSDFWindow live view, headless)
"""

from __future__ import annotations

import os
import numpy as np


class SDFSliceViewer:
    """Scrub slices of a dense SDF grid.

    ``show()`` opens an interactive matplotlib window (scroll / arrow keys
    change slice); ``save(dir)`` writes every slice as PNG headlessly.
    """

    def __init__(self, sdf_grid: np.ndarray, up_ix: int = 1,
                 sdf_range=(-2.0, 2.0)):
        self.grid = np.asarray(sdf_grid)
        self.up_ix = up_ix
        self.sdf_range = sdf_range
        self.idx = self.grid.shape[up_ix] // 2

    def _slice_img(self, i):
        from isdf_tpu.vis.slices import sdf_colormap
        sl = np.take(self.grid, i, axis=self.up_ix)
        return sdf_colormap(sl, self.sdf_range)

    def save(self, out_dir: str, stride: int = 8):
        import cv2
        os.makedirs(out_dir, exist_ok=True)
        n = self.grid.shape[self.up_ix]
        for i in range(0, n, stride):
            cv2.imwrite(os.path.join(out_dir, f"slice_{i:04d}.png"),
                        self._slice_img(i)[..., ::-1])

    def show(self):  # pragma: no cover - requires a display
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        im = ax.imshow(self._slice_img(self.idx))
        ax.set_title(f"slice {self.idx}")

        def redraw():
            im.set_data(self._slice_img(self.idx))
            ax.set_title(f"slice {self.idx}")
            fig.canvas.draw_idle()

        def on_scroll(ev):
            self.idx = int(np.clip(
                self.idx + (1 if ev.button == "up" else -1),
                0, self.grid.shape[self.up_ix] - 1))
            redraw()

        def on_key(ev):
            d = {"up": 1, "right": 1, "down": -1, "left": -1}.get(ev.key, 0)
            if d:
                self.idx = int(np.clip(
                    self.idx + d, 0, self.grid.shape[self.up_ix] - 1))
                redraw()

        fig.canvas.mpl_connect("scroll_event", on_scroll)
        fig.canvas.mpl_connect("key_press_event", on_key)
        plt.show()


class SDFPointcloudViewer:
    """Scrub z-slabs of a scattered SDF pointcloud [n, 4] = (xyz, sdf) —
    the reference SDFViewer's ``sdf_pc`` mode (sdf_viewer.py:92-103):
    quantise z into at most ``max_slabs`` levels (same snapping rule),
    then render one slab of points at a time with the surface-band
    colormap. ``save(dir)`` is the headless form; ``show()`` scrubs
    interactively."""

    def __init__(self, sdf_pc: np.ndarray, max_slabs: int = 40,
                 sdf_range=None, up_ix: int = 2):
        pc = np.asarray(sdf_pc, np.float32).copy()
        assert pc.ndim == 2 and pc.shape[1] == 4, "sdf_pc must be [n,4]"
        self.up_ix = up_ix
        z = pc[:, up_ix]
        zs = np.unique(z)
        if len(zs) > max_slabs:
            # snap via the integer slab index (the reference's modulo
            # subtraction leaves float32 residue that breaks the
            # equality grouping below)
            z0 = float(z.min())
            step = (float(z.max()) - z0) / (max_slabs - 1)
            idx = np.clip(np.floor((z - z0) / step), 0, max_slabs - 1)
            pc[:, up_ix] = (z0 + idx * step).astype(np.float32)
            zs = np.unique(pc[:, up_ix])
        self.pc = pc
        self.zs = zs
        if sdf_range is None:
            # the diverging colormap needs vmin < 0 < vmax
            sdf_range = (min(float(pc[:, 3].min()), -1e-3),
                         max(float(pc[:, 3].max()), 1e-3))
        self.sdf_range = sdf_range
        self.idx = len(zs) // 2

    def _slab_img(self, i, size=480):
        from isdf_tpu.vis.slices import sdf_colormap
        m = self.pc[:, self.up_ix] == self.zs[i]
        pts = self.pc[m, :3]
        cols = sdf_colormap(self.pc[m, 3][None, :],
                            self.sdf_range)[0] / 255.0
        return render_pointcloud_image(pts, cols, size=size,
                                       bounds=self.pc[:, :3])

    def save(self, out_dir: str, stride: int = 1):
        import cv2
        os.makedirs(out_dir, exist_ok=True)
        for i in range(0, len(self.zs), stride):
            cv2.imwrite(os.path.join(out_dir, f"slab_{i:04d}.png"),
                        self._slab_img(i)[..., ::-1])

    def show(self):  # pragma: no cover - requires a display
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        im = ax.imshow(self._slab_img(self.idx))
        ax.set_title(f"z = {self.zs[self.idx]:.2f}")

        def on_scroll(ev):
            self.idx = int(np.clip(
                self.idx + (1 if ev.button == "up" else -1),
                0, len(self.zs) - 1))
            im.set_data(self._slab_img(self.idx))
            ax.set_title(f"z = {self.zs[self.idx]:.2f}")
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("scroll_event", on_scroll)
        plt.show()


def render_mesh_image(verts: np.ndarray, faces: np.ndarray,
                      azim: float = 45.0, elev: float = 25.0,
                      size: int = 640) -> np.ndarray:
    """Simple offscreen shaded render of a mesh via matplotlib 3D."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    fig = plt.figure(figsize=(size / 100, size / 100), dpi=100)
    ax = fig.add_subplot(projection="3d")
    tri = verts[faces]
    # simple Lambertian shading by face normal . light
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    light = np.array([0.4, 0.6, 0.7])
    shade = 0.3 + 0.7 * np.clip(n @ light, 0, 1)
    col = np.stack([shade, shade, shade * 0.95], axis=1)
    pc = Poly3DCollection(tri, facecolors=col, linewidths=0)
    ax.add_collection3d(pc)
    lo, hi = verts.min(0), verts.max(0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def render_pointcloud_image(pts: np.ndarray, cols: np.ndarray,
                            azim: float = 45.0, elev: float = 25.0,
                            size: int = 640, bounds=None) -> np.ndarray:
    """Offscreen scatter render of a coloured pointcloud (the headless
    counterpart of the reference viewer's trimesh.PointCloud scenes)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(size / 100, size / 100), dpi=100)
    ax = fig.add_subplot(projection="3d")
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=cols, s=1.0,
                   linewidths=0, depthshade=False)
    ref = pts if bounds is None else np.asarray(bounds)
    if len(ref):
        lo, hi = ref.min(0), ref.max(0)
        c = (lo + hi) / 2
        r = max((hi - lo).max() / 2, 1e-3)
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def save_level_sets(trainer, out_dir: str, limits=None,
                    max_points: int = 200000, azim: float = 45.0):
    """Level-set render sequence: progressively strip the SDF pointcloud
    by lower limits and save one frame per limit (the headless-save form
    of the reference's SDFViewer.save_level_sets,
    sdf_viewer.py:433-451)."""
    import cv2

    from isdf_tpu.vis.slices import sdf_colormap

    os.makedirs(out_dir, exist_ok=True)
    pts = np.asarray(trainer.grid_pc)
    sdf = trainer.sdf_fn(pts).reshape(-1)
    if limits is None:
        limits = np.linspace(sdf.min(), 0.5 * sdf.max(), 12)
    rng = np.random.default_rng(0)
    bounds = pts[:: max(len(pts) // 1000, 1)]
    out = []
    for i, lim in enumerate(limits):
        keep = sdf > lim
        p = pts[keep]
        s = sdf[keep]
        if len(p) > max_points:
            sel = rng.choice(len(p), max_points, replace=False)
            p, s = p[sel], s[sel]
        cols = sdf_colormap(s).astype(np.float32) / 255.0
        img = render_pointcloud_image(p, cols, azim=azim, bounds=bounds)
        fname = os.path.join(out_dir, f"{i:04d}.png")
        cv2.imwrite(fname, img[..., ::-1])
        out.append(fname)
    return out


def save_traj_seq(trainer, out_dir: str, poses=None, stride: int = 1):
    """Trajectory fly-through: render the reconstruction from each camera
    pose of the (keyframe) trajectory (headless-save form of the
    reference's SDFViewer.save_seq, sdf_viewer.py:452-486)."""
    import cv2

    from isdf_tpu.vis.mesh_export import reconstruct_mesh

    os.makedirs(out_dir, exist_ok=True)
    if poses is None:
        poses = trainer.frames.T_WC_batch_np()
    poses = np.asarray(poses)[::stride]
    verts, faces = reconstruct_mesh(trainer)
    if len(faces) == 0:
        return []
    out = []
    for i, T in enumerate(poses):
        # look direction -> azim/elev for the offscreen camera
        fwd = T[:3, 2]
        azim = float(np.degrees(np.arctan2(fwd[1], fwd[0])))
        elev = float(np.degrees(np.arcsin(np.clip(-fwd[2], -1, 1))))
        img = render_mesh_image(verts, faces, azim=azim, elev=elev)
        fname = os.path.join(out_dir, f"{i:04d}.png")
        cv2.imwrite(fname, img[..., ::-1])
        out.append(fname)
    return out


def mesh_turntable(trainer, out_dir: str, n_views: int = 8):
    """Ring of offscreen mesh renders (headless stand-in for the GUI's
    orbiting camera)."""
    import cv2
    from isdf_tpu.vis.mesh_export import reconstruct_mesh

    os.makedirs(out_dir, exist_ok=True)
    verts, faces = reconstruct_mesh(trainer)
    if len(faces) == 0:
        return
    for i in range(n_views):
        img = render_mesh_image(verts, faces, azim=360.0 * i / n_views)
        cv2.imwrite(os.path.join(out_dir, f"view_{i:02d}.png"),
                    img[..., ::-1])


def monitor(trainer, out_dir: str, tag: str = ""):
    """One composite monitoring frame: keyframes + latest render + slices.
    The headless counterpart of the reference's live windows."""
    import cv2
    from isdf_tpu.vis.views import keyframe_strip, latest_frame_vis

    os.makedirs(out_dir, exist_ok=True)
    if len(trainer.frames) == 0:
        return
    strip = keyframe_strip(trainer)
    latest = latest_frame_vis(trainer)
    # perf readout on the live panel (reference GUI's compute-balance
    # label, isdf_window.py:694-708)
    bal = trainer.perf_summary()
    if bal:
        txt = (f"{bal.get('steps_per_sec', 0):.0f} steps/s  "
               + " ".join(f"{k}:{v:.1f}s" for k, v in bal.items()
                          if k != "steps_per_sec"))
        latest = np.ascontiguousarray(latest)
        cv2.putText(latest, txt, (8, 18), cv2.FONT_HERSHEY_SIMPLEX,
                    0.45, (255, 255, 0), 1, cv2.LINE_AA)
    cv2.imwrite(os.path.join(out_dir, f"{tag}keyframes.png"),
                strip[..., ::-1])
    cv2.imwrite(os.path.join(out_dir, f"{tag}latest.png"),
                latest[..., ::-1])
