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
