"""Live-mode ingestion: producer process -> latest-frame queue -> trainer.

Covers the reference's ROS path architecture (separate process + size-1
drop-stale queue + train-on-latest, isdf/datasets/dataset.py:273-338)
without rospy.
"""

import os
import time

import numpy as np
import pytest

from isdf_tpu.data.live import (DirectoryWatchSource, FrameSourceProcess,
                                LiveDataset, record_frames)


def _write_frame(d, i, depth_val):
    depth = np.full((16, 24), depth_val, np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.01 * i
    tmp = os.path.join(d, f".tmp{i}.npz")
    np.savez(tmp, depth=depth, T=T)
    os.replace(tmp, os.path.join(d, f"frame{i:04d}.npz"))


def test_directory_watch_live_pipeline(tmp_path):
    d = str(tmp_path)
    _write_frame(d, 0, 1.0)

    src = FrameSourceProcess(DirectoryWatchSource(d, poll_s=0.01)).start()
    try:
        ds = LiveDataset(src, camera=dict(H=16, W=24, fx=10.0, fy=10.0,
                                          cx=12.0, cy=8.0))
        s = ds[0]
        assert s["depth"].shape == (16, 24)
        first_val = float(s["depth"][0, 0])
        assert first_val in (1.0, 2.0, 3.0)

        # stream newer frames; latest-wins semantics
        for i in range(1, 4):
            _write_frame(d, i, float(i + 1))
        deadline = time.time() + 10
        val = first_val
        while time.time() < deadline and val != 4.0:
            val = float(ds[0]["depth"][0, 0])
            time.sleep(0.05)
        assert val == 4.0  # newest frame (depth 4.0) won
        assert float(ds[0]["T"][0, 3]) == pytest.approx(0.03)
    finally:
        src.close()


def test_record_frames_offline_format(tmp_path):
    class FakeLive:
        def __getitem__(self, _):
            return {"image": np.zeros((8, 8, 3), np.uint8),
                    "depth": np.ones((8, 8), np.float32),
                    "T": np.eye(4, dtype=np.float32)}

    out = str(tmp_path / "rec")
    record_frames(FakeLive(), out, n_frames=3, fps=1000.0)
    assert os.path.exists(os.path.join(out, "depth000002.npy"))
    assert os.path.exists(os.path.join(out, "traj.txt"))
    traj = np.loadtxt(os.path.join(out, "traj.txt"))
    assert traj.shape == (3, 17)  # timestamp + 16 pose entries

    # readable by the offline dataset class
    from isdf_tpu.data.datasets import RealsenseFrankaOffline
    from isdf_tpu.utils.config import Config
    ds = RealsenseFrankaOffline(out, Config().replace(depth_scale=1.0))
    assert len(ds) == 3
    s = ds[0]
    assert s["depth"].shape == (8, 8)


def test_stream_dataset_replays_by_wallclock():
    from isdf_tpu.data.datasets import StreamDataset

    class Seq:
        def __len__(self):
            return 100

        def camera(self):
            return {}

        def __getitem__(self, i):
            return {"idx": int(i)}

    sd = StreamDataset(Seq(), fps=1000.0)
    first = sd[0]["idx"]
    time.sleep(0.05)
    later = sd[0]["idx"]
    assert later > first


def test_make_dataset_returns_live_datasets_for_shipped_configs(tmp_path):
    """The shipped live configs (train/configs/realsense.json,
    realsense_franka.json — reference isdf/train/configs equivalents)
    construct a LiveDataset through make_dataset (VERDICT r2 item 5)."""
    from isdf_tpu.data.datasets import make_dataset
    from isdf_tpu.utils.config import load_config

    base = os.path.join(os.path.dirname(__file__), "..", "isdf_tpu",
                        "train", "configs")
    for name, fmt, has_cal in (("realsense.json", "realsense", False),
                               ("realsense_franka.json",
                                "realsense_franka", True)):
        cfg = load_config(os.path.join(base, name))
        assert cfg.dataset_format == fmt and cfg.live
        cfg = cfg.replace(live_dir=str(tmp_path))
        ds = make_dataset(cfg)
        try:
            assert isinstance(ds, LiveDataset)
            assert ds.camera()["W"] == 1280
            assert (ds.ext_calib is not None) == has_cal
            if has_cal:
                assert "camera_ee_pos" in ds.ext_calib[0]
                assert cfg.workspace_extents is not None  # table bounds
            else:
                # distortion coefficients reach the undistortion map
                assert ds.depth_transform.distortion is not None
        finally:
            ds.source.close()


def test_live_trainer_e2e_loss_falls(tmp_path):
    """End-to-end live mode: a producer process drops synthetic wall
    frames into live_dir, make_dataset wires the watch->queue->LiveDataset
    pipeline, and the Trainer ingests frames and learns the wall
    (VERDICT r2 item 5 'Done' criterion)."""
    import jax.numpy as jnp

    from isdf_tpu.data.datasets import make_dataset
    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import config_from_dict

    d = str(tmp_path)
    H, W = 24, 32
    # frames: a wall at z=2 seen from slightly jittered poses (depth in
    # mm, uint16 — the bridge convention depth_scale=1000 expects)
    rng = np.random.default_rng(0)
    for i in range(6):
        depth = np.full((H, W), 2000 + 40 * rng.standard_normal((H, W)),
                        np.uint16)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.02 * i
        tmp = os.path.join(d, f".tmp{i}.npz")
        np.savez(tmp, depth=depth, T=T)
        os.replace(tmp, os.path.join(d, f"frame{i:04d}.npz"))

    cfg = config_from_dict({
        "dataset": {"format": "realsense", "live_dir": d,
                    "depth_scale": 1000.0, "fps": 30,
                    "camera": {"w": W, "h": H, "fx": 20.0, "fy": 20.0,
                               "cx": W / 2, "cy": H / 2}},
        "sample": {"n_rays": 15, "n_rays_is_kf": 30,
                   "n_strat_samples": 5, "n_surf_samples": 2,
                   "depth_range": [0.15, 3.0]},
        "model": {"iters_per_frame": 10, "iters_per_kf": 20,
                  "window_size": 3, "hidden_layers_block": 1},
        "eval": {"do_eval": 0},
    })
    ds = make_dataset(cfg)
    try:
        tr = Trainer(cfg, dataset=ds, seed=0)
        # external probe: SDF along the optical axis should approach
        # (2 - z) near the wall
        probe = jnp.asarray(
            np.stack([np.zeros(8), np.zeros(8),
                      np.linspace(0.5, 1.9, 8)], 1).astype(np.float32))
        gt = 2.0 - np.asarray(probe)[:, 2]

        def mae():
            return float(np.abs(np.asarray(
                tr.sdf_fn(probe)).reshape(-1) - gt).mean())

        before = mae()
        train_loop(tr, max_steps=230, extra_opt_steps=0, log_fn=None)
        after = mae()
        assert tr.buffer.count >= 2          # first frame + >=1 keyframe
        assert after < before * 0.7, (before, after)
    finally:
        ds.source.close()


def test_arkit_wire_format_and_pose_conversion(tmp_path):
    """ARKit depth-message decoding + pose conversion match the
    reference's (commented-out) ingester semantics
    (isdf/datasets/dataset.py:341-437): float32 [16 col-major pose |
    4 intrinsics | 192x256 depth], 180-deg-about-x frame flip with the
    x-euler offset; directory source feeds the live pipeline."""
    from scipy.spatial.transform import Rotation

    from isdf_tpu.data.arkit import (DEPTH_H, DEPTH_W,
                                     ARKitDirectorySource,
                                     arkit_pose_to_T_WC,
                                     decode_depth_message)

    # a non-trivial ARKit pose (y-up camera convention)
    R_a = Rotation.from_euler("xyz", [10, 25, -40],
                              degrees=True).as_matrix()
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = R_a
    P[:3, 3] = [0.4, -0.2, 1.3]
    buf16 = P.T.reshape(-1)                    # column-major wire layout

    # independent reimplementation of the reference math
    tf = np.diag([1.0, -1.0, -1.0, 1.0])
    want = tf @ P.astype(np.float64)
    rot = Rotation.from_matrix(want[:3, :3]).as_euler("xyz", degrees=True)
    rot[0] += 180.0
    want[:3, :3] = Rotation.from_euler("xyz", rot, degrees=True).as_matrix()

    T = arkit_pose_to_T_WC(buf16)
    assert np.allclose(T, want, atol=1e-5)
    assert np.allclose(T[3], [0, 0, 0, 1])

    depth = np.linspace(0.5, 3.0, DEPTH_H * DEPTH_W,
                        dtype=np.float32).reshape(DEPTH_H, DEPTH_W)
    intr = np.array([212.0, 212.0, 128.0, 96.0], np.float32)
    msg = np.concatenate([buf16, intr, depth.reshape(-1)]).tobytes()
    d2, T2, i2 = decode_depth_message(msg)
    assert np.allclose(d2, depth) and np.allclose(i2, intr)
    assert np.allclose(T2, T)
    with pytest.raises(ValueError):
        decode_depth_message(msg[:-8])         # truncated buffer

    # directory source -> live pipeline -> make_dataset('arkit')
    with open(tmp_path / ".tmp0.bin", "wb") as f:
        f.write(msg)
    os.replace(tmp_path / ".tmp0.bin", tmp_path / "frame0000.bin")

    from isdf_tpu.data.datasets import make_dataset
    from isdf_tpu.data.live import LiveDataset
    from isdf_tpu.utils.config import config_from_dict
    cfg = config_from_dict({
        "dataset": {"format": "arkit", "live_dir": str(tmp_path),
                    "depth_scale": 1.0,
                    "camera": {"w": DEPTH_W, "h": DEPTH_H,
                               "fx": 212.0, "fy": 212.0,
                               "cx": 128.0, "cy": 96.0}},
        "sample": {"depth_range": [0.07, 12.0]},
    })
    assert cfg.live
    ds = make_dataset(cfg)
    try:
        assert isinstance(ds, LiveDataset)
        s = ds[0]
        assert s["depth"].shape == (DEPTH_H, DEPTH_W)
        assert np.allclose(s["T"], T, atol=1e-6)
    finally:
        ds.source.close()

    # broker source is import-gated with a clear message (pika absent)
    from isdf_tpu.data.arkit import ARKitQueueSource
    with pytest.raises(RuntimeError, match="pika"):
        ARKitQueueSource()


def test_arkit_directory_source_retries_partial_files(tmp_path):
    """A frame*.bin caught mid-write (decode fails) must be re-read on a
    later poll once complete — files are only marked seen AFTER a
    successful decode (a bridge writing non-atomically must not lose
    frames forever)."""
    import threading

    from isdf_tpu.data.arkit import (DEPTH_H, DEPTH_W,
                                     ARKitDirectorySource)

    P = np.eye(4, dtype=np.float32)
    depth = np.full((DEPTH_H, DEPTH_W), 1.5, np.float32)
    intr = np.array([212.0, 212.0, 128.0, 96.0], np.float32)
    msg = np.concatenate([P.T.reshape(-1), intr,
                          depth.reshape(-1)]).tobytes()

    # partially-written file (truncated): decode raises ValueError
    path = tmp_path / "frame0000.bin"
    with open(path, "wb") as f:
        f.write(msg[: len(msg) // 2])

    src = ARKitDirectorySource(str(tmp_path), poll_s=0.01)
    got = []
    stop = threading.Event()
    th = threading.Thread(target=src, args=(got.append, stop),
                          daemon=True)
    th.start()
    try:
        time.sleep(0.1)
        assert got == []            # partial file produced nothing
        with open(path, "wb") as f:  # bridge finishes the write
            f.write(msg)
        t0 = time.time()
        while not got and time.time() - t0 < 5.0:
            time.sleep(0.02)
        assert got, "completed file was never re-read"
        assert np.allclose(got[0]["depth"], depth)
    finally:
        stop.set()
        th.join(timeout=2.0)


def test_ee_to_cam_hand_eye_transform():
    """EE pose -> camera pose matches the reference's hand-eye math
    (node.py:162-168): position offset rotates with the EE, orientations
    compose (VERDICT r1 item 8)."""
    from scipy.spatial.transform import Rotation

    from isdf_tpu.data.live import LiveDataset, ee_to_cam

    cal = [{"camera_ee_pos": [0.1, 0.0, 0.05],
            "camera_ee_ori_rotvec": [0.0, 0.0, np.pi / 2]}]
    # EE rotated 90 deg about x, at (1, 2, 3)
    R_ee = Rotation.from_euler("x", 90, degrees=True).as_matrix()
    T_ee = np.eye(4, dtype=np.float32)
    T_ee[:3, :3] = R_ee
    T_ee[:3, 3] = [1.0, 2.0, 3.0]

    T_cam = ee_to_cam(T_ee, cal)
    want_t = np.array([1, 2, 3]) + R_ee @ np.array([0.1, 0.0, 0.05])
    want_R = R_ee @ Rotation.from_rotvec([0, 0, np.pi / 2]).as_matrix()
    assert np.allclose(T_cam[:3, 3], want_t, atol=1e-6)
    assert np.allclose(T_cam[:3, :3], want_R, atol=1e-6)
    assert np.allclose(T_cam[3], [0, 0, 0, 1])

    # identity calibration == pass-through
    ident = [{"camera_ee_pos": [0, 0, 0],
              "camera_ee_ori_rotvec": [0, 0, 0]}]
    assert np.allclose(ee_to_cam(T_ee, ident), T_ee, atol=1e-7)

    # LiveDataset applies it on ingest
    class FakeSource:
        class queue:
            @staticmethod
            def get_latest(timeout=None):
                return {"depth": np.ones((4, 4), np.float32), "T": T_ee}

    ds = LiveDataset(FakeSource(), camera={}, ext_calib=cal)
    out = ds[0]
    assert np.allclose(out["T"][:3, 3], want_t, atol=1e-6)
