"""3D composite scene view: mesh + keyframe frustums + trajectory + live
depth pointcloud in ONE navigable render.

The reference GUI composes exactly this content in its interactive
widget3d scene (isdf/visualisation/isdf_window.py:29-806: the
reconstructed mesh, per-keyframe camera frustums, the current camera and
the latest depth pointcloud) with the camera geometry built in
isdf/visualisation/draw3D.py:16-108 (draw_camera / draw_cams /
draw_trajectory). Open3D is not installable here and the host is
typically remote, so this is the headless counterpart: pure-numpy scene
assembly + a matplotlib offscreen render, served by the web viewer
(vis/server.py ``/api/scene.png`` — azim/elev/zoom camera, content
toggles through ``/api/control``).

Every input is host-side numpy (the Trainer's FrameStore mirrors), so
rendering is safe on HTTP handler threads — it never touches device
arrays that the training loop may be donating mid-bundle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

MESH_COLOR = np.array([0.72, 0.78, 0.84])
KF_COLOR = "#ffb347"      # keyframe frustums (reference: orange wireframe)
CUR_COLOR = "#ff3b30"     # current camera (reference: red, larger)
TRAJ_COLOR = "#4da3ff"    # camera trajectory polyline


def frustum_segments(T_WC: np.ndarray, fx: float, fy: float,
                     cx: float, cy: float, W: int, H: int,
                     depth: float = 0.35) -> np.ndarray:
    """Wireframe camera frustum: 8 segments (4 rays from the optical
    centre to the image corners at ``depth``, 4 closing the far
    rectangle) — the marker geometry of reference draw3D.py:16-48
    (draw_camera's o3d LineSet)."""
    T_WC = np.asarray(T_WC, np.float64)
    corners = np.array([[0, 0], [W - 1, 0], [W - 1, H - 1], [0, H - 1]],
                       np.float64)
    dirs = np.stack([(corners[:, 0] - cx) / fx,
                     (corners[:, 1] - cy) / fy,
                     np.ones(4)], axis=1)
    pts_C = dirs * depth
    R, t = T_WC[:3, :3], T_WC[:3, 3]
    pts_W = pts_C @ R.T + t
    segs = []
    for i in range(4):
        segs.append([t, pts_W[i]])
        segs.append([pts_W[i], pts_W[(i + 1) % 4]])
    return np.asarray(segs, np.float32)


def backproject_depth(depth: np.ndarray, T_WC: np.ndarray,
                      fx: float, fy: float, cx: float, cy: float,
                      stride: int = 8, max_points: int = 20000):
    """Subsampled world pointcloud of one depth image (the live depth
    pointcloud panel of the reference window, isdf_window.py pcd
    updates). Returns (pts_W [n,3], depth values [n]) for colouring."""
    d = np.asarray(depth, np.float32)[::stride, ::stride]
    H, W = d.shape
    vs, us = np.mgrid[0:H, 0:W]
    valid = d > 0
    z = d[valid]
    u = us[valid] * stride
    v = vs[valid] * stride
    pts_C = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], axis=1)
    if len(pts_C) > max_points:
        sel = np.random.default_rng(0).choice(len(pts_C), max_points,
                                              replace=False)
        pts_C, z = pts_C[sel], z[sel]
    T_WC = np.asarray(T_WC, np.float64)
    pts_W = pts_C @ T_WC[:3, :3].T + T_WC[:3, 3]
    return pts_W.astype(np.float32), z


def render_composite(
    verts: Optional[np.ndarray] = None,
    faces: Optional[np.ndarray] = None,
    kf_poses: Optional[np.ndarray] = None,
    cur_pose: Optional[np.ndarray] = None,
    traj: Optional[np.ndarray] = None,
    pc_pts: Optional[np.ndarray] = None,
    pc_vals: Optional[np.ndarray] = None,
    cam: Optional[dict] = None,
    azim: float = 45.0,
    elev: float = 25.0,
    zoom: float = 1.0,
    size: int = 560,
    bounds: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Offscreen render of the composite scene. Any element may be None.

    cam: dict(fx, fy, cx, cy, W, H) for frustum geometry.
    zoom: >1 moves the camera in (smaller world radius).
    bounds: [n, 3] points fixing the axes box (defaults to the content).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import (Line3DCollection,
                                            Poly3DCollection)

    fig = plt.figure(figsize=(size / 100, size / 100), dpi=100)
    ax = fig.add_subplot(projection="3d")
    extent_pts = []

    if verts is not None and faces is not None and len(faces):
        tri = verts[faces]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
        light = np.array([0.4, 0.6, 0.7])
        shade = (0.25 + 0.75 * np.clip(n @ light, 0, 1))[:, None]
        pcol = Poly3DCollection(tri, facecolors=shade * MESH_COLOR,
                                linewidths=0)
        ax.add_collection3d(pcol)
        extent_pts.append(verts)

    if pc_pts is not None and len(pc_pts):
        if pc_vals is not None and len(pc_vals):
            import matplotlib.cm as cm
            v = np.asarray(pc_vals, np.float32)
            vn = (v - v.min()) / max(float(v.max() - v.min()), 1e-6)
            cols = cm.turbo(vn)[:, :3]
        else:
            cols = "#8fd18f"
        ax.scatter(pc_pts[:, 0], pc_pts[:, 1], pc_pts[:, 2], c=cols,
                   s=1.2, linewidths=0, depthshade=False)
        extent_pts.append(pc_pts)

    if traj is not None and len(traj) >= 2:
        traj = np.asarray(traj, np.float32)
        ax.plot(traj[:, 0], traj[:, 1], traj[:, 2], color=TRAJ_COLOR,
                linewidth=1.4)
        extent_pts.append(traj)

    if kf_poses is not None and len(kf_poses) and cam is not None:
        segs = np.concatenate([
            frustum_segments(T, cam["fx"], cam["fy"], cam["cx"],
                             cam["cy"], cam["W"], cam["H"])
            for T in kf_poses])
        ax.add_collection3d(Line3DCollection(segs, colors=KF_COLOR,
                                             linewidths=0.9))
        extent_pts.append(np.asarray(kf_poses)[:, :3, 3])

    if cur_pose is not None and cam is not None:
        segs = frustum_segments(cur_pose, cam["fx"], cam["fy"],
                                cam["cx"], cam["cy"], cam["W"], cam["H"],
                                depth=0.5)
        ax.add_collection3d(Line3DCollection(segs, colors=CUR_COLOR,
                                             linewidths=2.0))
        extent_pts.append(np.asarray(cur_pose)[None, :3, 3])

    ref = (np.concatenate([np.asarray(p).reshape(-1, 3)
                           for p in extent_pts])
           if extent_pts else np.zeros((1, 3), np.float32))
    if bounds is not None and len(bounds):
        ref = np.asarray(bounds).reshape(-1, 3)
    lo, hi = ref.min(0), ref.max(0)
    c = (lo + hi) / 2
    r = max(float((hi - lo).max()) / 2, 1e-3) / max(float(zoom), 1e-2)
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


def composite_from_trainer(trainer, verts=None, faces=None,
                           azim: float = 45.0, elev: float = 25.0,
                           zoom: float = 1.0, size: int = 560,
                           show_mesh: bool = True,
                           show_frustums: bool = True,
                           show_traj: bool = True,
                           show_pc: bool = False) -> np.ndarray:
    """Build the composite inputs from a Trainer's HOST state (FrameStore
    numpy mirrors — no device reads, safe during a live run) and render.

    verts/faces: pass a cached reconstruction to avoid re-meshing (the
    web viewer reuses its turntable mesh); None skips the mesh unless
    show_mesh forces a fresh ``reconstruct_mesh``."""
    cam = dict(fx=trainer.fx, fy=trainer.fy, cx=trainer.cx,
               cy=trainer.cy, W=trainer.W, H=trainer.H)
    kf_poses = cur_pose = traj = pc_pts = pc_vals = None
    if len(trainer.frames):
        T = trainer.frames.T_WC_batch_np()
        if show_frustums:
            kf_poses, cur_pose = T[:-1], T[-1]
        if show_traj:
            traj = T[:, :3, 3]
        if show_pc:
            f = trainer.frames[-1]
            pc_pts, pc_vals = backproject_depth(
                f.depth, f.T_WC, cam["fx"], cam["fy"], cam["cx"],
                cam["cy"])
    if show_mesh and verts is None:
        from isdf_tpu.vis.mesh_export import reconstruct_mesh
        verts, faces = reconstruct_mesh(trainer)
    if not show_mesh:
        verts = faces = None
    return render_composite(
        verts=verts, faces=faces, kf_poses=kf_poses, cur_pose=cur_pose,
        traj=traj, pc_pts=pc_pts, pc_vals=pc_vals, cam=cam,
        azim=azim, elev=elev, zoom=zoom, size=size)
