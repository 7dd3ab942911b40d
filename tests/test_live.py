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
