"""Synthetic scenes with analytic ground-truth SDF.

No ReplicaCAD/ScanNet data ships in this environment (zero egress), so this
module provides the end-to-end oracle: a box room with primitive obstacles,
an exact signed distance function, a sphere-traced depth-camera renderer
and an orbiting trajectory. It plays the role of the reference's dataset +
GT-SDF tooling (isdf/datasets/{dataset.py,replicaCAD_gt_sdf.py}) for tests
and benchmarks, emitting frames in the reference sample format
{"image", "depth", "T"}.

Sign convention: positive in observable free space, negative inside
obstacles / behind walls — matching the composed ReplicaCAD GT SDFs
(min over stage and object SDFs, replicaCAD_gt_sdf.py:81-144).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import geometry as G


def sd_box(p, center, half_extents):
    """Exact box SDF (negative inside)."""
    q = jnp.abs(p - jnp.asarray(center)) - jnp.asarray(half_extents)
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def sd_sphere(p, center, radius):
    return jnp.linalg.norm(p - jnp.asarray(center), axis=-1) - radius


class SyntheticScene:
    """Box room [extents] centred at ``center`` with obstacle primitives."""

    def __init__(
        self,
        extents: Tuple[float, float, float] = (6.0, 3.0, 4.0),
        center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        spheres: Optional[List[Tuple[Tuple[float, float, float], float]]] = None,
        boxes: Optional[List[Tuple[Tuple[float, float, float],
                                   Tuple[float, float, float]]]] = None,
    ):
        self.extents = np.asarray(extents, np.float32)
        self.center = np.asarray(center, np.float32)
        if spheres is None:
            spheres = [((1.2, 0.7, 0.8), 0.5), ((-1.5, 0.9, -1.0), 0.4)]
        if boxes is None:
            boxes = [((0.0, 1.15, -0.8), (0.5, 0.35, 0.5)),
                     ((-1.8, 1.2, 1.2), (0.4, 0.3, 0.4))]
        self.spheres = spheres
        self.boxes = boxes

        self._sdf_jit = jax.jit(self.sdf)

    # ---- ground truth ----

    def sdf(self, p):
        """Exact free-space SDF at world points [..., 3]."""
        d = -sd_box(p, self.center, self.extents / 2.0)  # + inside the room
        for c, r in self.spheres:
            d = jnp.minimum(d, sd_sphere(p, c, r))
        for c, he in self.boxes:
            d = jnp.minimum(d, sd_box(p, c, he))
        return d

    def sdf_np(self, p):
        return np.asarray(self._sdf_jit(jnp.asarray(p, jnp.float32)))

    def gt_sdf_grid(self, dim: int = 64, pad: float = 0.0):
        """Regular GT grid + its voxel->world transform (like the
        reference's 1cm GT npy + transform.txt pair, trainer.py:446-453)."""
        half = self.extents / 2.0 + pad
        lo = self.center - half
        hi = self.center + half
        axes = [np.linspace(lo[i], hi[i], dim, dtype=np.float32)
                for i in range(3)]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        sdf = self.sdf_np(pts).reshape(dim, dim, dim)
        transform = np.eye(4, dtype=np.float32)
        for i in range(3):
            transform[i, i] = (hi[i] - lo[i]) / (dim - 1)
        transform[:3, 3] = lo
        return sdf, transform

    # ---- camera model / rendering ----

    @functools.partial(jax.jit, static_argnums=(0,))
    def render_depth(self, T_WC, dirs_C, max_depth: float = 12.0):
        """Sphere-traced z-depth image for rays dirs_C [..., 3] (z-conv).

        Returns z-depth (same convention as the dataset depth maps);
        0 where no surface within max_depth.
        """
        origins, dirs_W = G.origin_dirs_W(T_WC, dirs_C)
        dnorm = jnp.linalg.norm(dirs_W, axis=-1)

        def body(_, t):
            p = origins + dirs_W * t[..., None]
            d = self.sdf(p)
            return t + d / dnorm

        t = jnp.full(dirs_W.shape[:-1], 0.05, jnp.float32)
        t = jax.lax.fori_loop(0, 96, body, t)
        p = origins + dirs_W * t[..., None]
        hit = jnp.abs(self.sdf(p)) < 1e-3
        depth = jnp.where(hit & (t < max_depth), t, 0.0)
        return depth


# named scenes used as benchmark "sequences" by the batch runner
SCENE_PRESETS = {
    "room_a": dict(extents=(6.0, 3.0, 4.5),
                   spheres=[((1.2, 0.7, 0.8), 0.5), ((-1.5, 0.9, -1.0), 0.4)],
                   boxes=[((0.0, 1.15, -0.8), (0.5, 0.35, 0.5)),
                          ((-1.8, 1.2, 1.2), (0.4, 0.3, 0.4))]),
    "room_b": dict(extents=(5.0, 2.8, 6.0),
                   spheres=[((0.8, 0.9, -1.6), 0.45),
                            ((-1.2, 0.6, 1.8), 0.35),
                            ((1.6, 0.5, 1.2), 0.3)],
                   boxes=[((-0.6, 1.1, -0.4), (0.6, 0.3, 0.4))]),
    "room_c": dict(extents=(7.0, 3.2, 3.5),
                   spheres=[((2.2, 0.8, 0.0), 0.55)],
                   boxes=[((-1.5, 1.2, 0.6), (0.5, 0.4, 0.5)),
                          ((0.5, 1.3, -0.9), (0.35, 0.25, 0.35)),
                          ((-2.6, 0.9, -0.8), (0.3, 0.6, 0.3))]),
}


def make_scene(preset: str = "room_a") -> SyntheticScene:
    return SyntheticScene(**SCENE_PRESETS[preset])


class SyntheticDataset:
    """Reference-format dataset over a SyntheticScene.

    Frames follow an orbit inside the room: the camera circles the centre
    at ``orbit_radius`` looking inward-and-around, fps-timed like a
    ReplicaCAD trajectory. Sample dict matches the reference dataset
    classes (isdf/datasets/dataset.py:20-71): {"image" uint8 HxWx3,
    "depth" float HxW, "T" 4x4}.
    """

    def __init__(
        self,
        scene: SyntheticScene,
        n_frames: int = 300,
        H: int = 64,
        W: int = 96,
        hfov_deg: float = 70.0,
        orbit_radius: float = 1.4,
        cam_height: float = 0.0,
        max_depth: float = 12.0,
        seed: int = 0,
        pose_noise_std: float = 0.0,
        pose_noise_mode: str = "iid",
    ):
        """pose_noise_std: perturb the reported poses T by a random SE(3)
        twist (rotation+translation, std in rad/m) while rendering depth
        from (and reporting in "T_gt") the true pose — the pose-refinement
        evaluation scenario (engine/pose.py).

        pose_noise_mode: "iid" — independent per-frame perturbation;
        "walk" — the twist RANDOM-WALKS (each frame adds a N(0, std)
        increment), modelling tracker drift: the realistic failure mode
        pose refinement exists for (a drifting frame disagrees with the
        map built from its predecessors by the accumulated drift, while
        iid noise blurs the map itself by the same amount it perturbs
        any one frame)."""
        self.scene = scene
        self.n_frames = n_frames
        self.H, self.W = H, W
        self.fx = 0.5 * W / np.tan(np.deg2rad(hfov_deg) / 2)
        self.fy = self.fx
        self.cx, self.cy = (W - 1) / 2.0, (H - 1) / 2.0
        self.max_depth = max_depth
        self._dirs_C = G.ray_dirs_C(H, W, self.fx, self.fy, self.cx, self.cy)

        c = scene.center
        self.pose_noise_std = float(pose_noise_std)
        self._noise_rng = np.random.default_rng(seed + 1234)
        self.poses = []
        for i in range(n_frames):
            ang = 2 * np.pi * i / max(n_frames, 1) * 1.5
            eye = c + np.array([orbit_radius * np.cos(ang), cam_height,
                                orbit_radius * np.sin(ang)])
            look_ang = ang + 0.9
            target = c + np.array([2.5 * np.cos(look_ang), 0.15,
                                   2.5 * np.sin(look_ang)])
            R, t = G.look_at(eye, target, up=np.array([0.0, -1.0, 0.0]))
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = t
            self.poses.append(T)
        self.noisy_poses = None
        if self.pose_noise_std > 0:
            from isdf_tpu.ops import geometry as G2
            tw = self._noise_rng.normal(
                0.0, self.pose_noise_std, (n_frames, 6)).astype(np.float32)
            if pose_noise_mode == "walk":
                tw = np.cumsum(tw, axis=0)
            elif pose_noise_mode != "iid":
                raise ValueError(f"pose_noise_mode {pose_noise_mode!r}")
            pert = np.asarray(G2.exp_se3(jnp.asarray(tw)))
            self.noisy_poses = [pert[i] @ self.poses[i]
                                for i in range(n_frames)]
        self._cache = {}

    def __len__(self):
        return self.n_frames

    def camera(self):
        return dict(H=self.H, W=self.W, fx=self.fx, fy=self.fy,
                    cx=self.cx, cy=self.cy)

    def __getitem__(self, idx):
        idx = int(idx)
        if idx not in self._cache:
            T = self.poses[idx]
            depth = np.asarray(self.scene.render_depth(
                jnp.asarray(T), self._dirs_C, self.max_depth))
            # flat grey image (rgb unused by training; kept for API parity)
            image = np.full((self.H, self.W, 3), 128, np.uint8)
            sample = {"image": image, "depth": depth.astype(np.float32),
                      "T": T}
            if self.noisy_poses is not None:
                sample["T"] = self.noisy_poses[idx]
                sample["T_gt"] = T
            self._cache[idx] = sample
        return self._cache[idx]

    # scene bounds supplied directly (replaces mesh oriented_bounds path)
    def scene_bounds(self):
        """(bounds_transform [4,4], extents [3]) of the training domain."""
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = self.scene.center
        return T, self.scene.extents.copy()

    def gt_mesh(self, dim: int = 128):
        """(vertices, faces) of the analytic scene's zero level set —
        marching tetrahedra over the exact SDF (the mesh-eval GT; real
        datasets load gt_sdf_dir/mesh.obj instead, reference
        trainer.py:207)."""
        from isdf_tpu.utils.mesh3d import marching_tetrahedra

        half = self.scene.extents / 2.0 + 0.1
        lo = self.scene.center - half
        axes = [np.linspace(lo[a], lo[a] + 2 * half[a], dim,
                            dtype=np.float32) for a in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        sdf = self.scene.sdf_np(pts.reshape(-1, 3)).reshape(dim, dim, dim)
        verts_idx, faces = marching_tetrahedra(sdf, level=0.0)
        spacing = 2 * half / (dim - 1)
        verts = lo[None, :] + verts_idx * spacing[None, :]
        return verts.astype(np.float32), faces
