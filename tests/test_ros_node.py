"""rospy transport layer (data/ros_node.py) — decode logic and node
wiring tested without ROS, against scipy as the rotation oracle
(the reference's own quaternion backend, isdf/ros_utils/node.py:72)."""

import sys
import threading
import time
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from isdf_tpu.data import ros_node
from isdf_tpu.data.live import ee_to_cam


def _img_msg(arr):
    return NS(data=arr.tobytes(), height=arr.shape[0], width=arr.shape[1])


def _pose_msg(t, q_xyzw):
    return NS(position=NS(x=t[0], y=t[1], z=t[2]),
              orientation=NS(x=q_xyzw[0], y=q_xyzw[1], z=q_xyzw[2],
                             w=q_xyzw[3]))


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_quat_xyzw_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = _rand_quat(rng)
        ours = ros_node.quat_xyzw_to_R(q)
        oracle = Rotation.from_quat(q).as_matrix()
        assert np.allclose(ours, oracle, atol=1e-12)


def test_decode_image_msg_shapes_and_crop():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    depth = rng.integers(0, 5000, (480, 640), dtype=np.uint16)

    out = ros_node.decode_image_msg(_img_msg(rgb), np.uint8, 3)
    assert out.shape == (480, 640, 3) and np.array_equal(out, rgb)
    out = ros_node.decode_image_msg(_img_msg(depth), np.uint16)
    assert out.dtype == np.uint16 and np.array_equal(out, depth)

    # calibration crop: margins 40 px wide, 20 px tall (node.py:54-60)
    c = ros_node.decode_image_msg(_img_msg(rgb), np.uint8, 3, crop=True)
    assert c.shape == (440, 560, 3)
    assert np.array_equal(c, rgb[20:460, 40:600])


def test_pose_msg_to_T_WC_inverts():
    rng = np.random.default_rng(2)
    q = _rand_quat(rng)
    t = rng.normal(size=3)
    # the /frames pose is world->camera; T_WC is its rigid inverse
    # (node.py:69-76)
    T_cw = np.eye(4)
    T_cw[:3, :3] = Rotation.from_quat(q).as_matrix()
    T_cw[:3, 3] = t
    T_wc = ros_node.pose_msg_to_T_WC(_pose_msg(t, q))
    assert np.allclose(T_wc @ T_cw, np.eye(4), atol=1e-10)
    # and the no-inversion variant round-trips the components
    assert np.allclose(ros_node.pose_msg_to_T(_pose_msg(t, q)), T_cw,
                       atol=1e-12)


def test_decode_frame_msg():
    rng = np.random.default_rng(3)
    bgr = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    depth = rng.integers(0, 5000, (60, 80), dtype=np.uint16)
    q, t = _rand_quat(rng), rng.normal(size=3)
    msg = NS(rgb=_img_msg(bgr), depth=_img_msg(depth), pose=_pose_msg(t, q))

    f = ros_node.decode_frame_msg(msg)
    assert np.array_equal(f["image"], bgr[..., ::-1])  # BGR -> RGB
    assert f["depth"].dtype == np.float32
    assert np.array_equal(f["depth"], depth.astype(np.float32))
    assert f["T"].shape == (4, 4) and f["T"].dtype == np.float32
    want = np.linalg.inv(ros_node.pose_msg_to_T(msg.pose))
    assert np.allclose(f["T"], want, atol=1e-5)


def test_compose_franka_frame_gates_and_resizes():
    rng = np.random.default_rng(4)
    bgr = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
    depth = rng.integers(0, 5000, (30, 40), dtype=np.uint16)
    T = np.eye(4, dtype=np.float32)

    # any missing stream -> no frame yet (node.py:130-131)
    assert ros_node.compose_franka_frame(None, depth, T) is None
    assert ros_node.compose_franka_frame(bgr, None, T) is None
    assert ros_node.compose_franka_frame(bgr, depth, None) is None

    f = ros_node.compose_franka_frame(bgr, depth, T, size_wh=(80, 60))
    assert f["image"].shape == (60, 80, 3)
    assert f["depth"].shape == (60, 80) and f["depth"].dtype == np.float32

    # same-size path: exact BGR flip, no resampling
    f = ros_node.compose_franka_frame(bgr, depth, T, size_wh=(40, 30))
    assert np.array_equal(f["image"], bgr[..., ::-1])
    assert np.array_equal(f["depth"], depth.astype(np.float32))


class _StubRospy(types.ModuleType):
    """Captures subscriptions; delivers messages synchronously."""

    def __init__(self):
        super().__init__("rospy")
        self.subs = {}
        self.inited = None

    def init_node(self, name, anonymous=False):
        self.inited = name

    def Subscriber(self, topic, msg_type, cb, queue_size=None):
        self.subs[topic] = cb

    def is_shutdown(self):
        return False


def _run_source(source, stub, monkeypatch, extra_modules=()):
    monkeypatch.setitem(sys.modules, "rospy", stub)
    for name, mod in extra_modules:
        monkeypatch.setitem(sys.modules, name, mod)
    got = []
    stop = threading.Event()
    th = threading.Thread(target=source, args=(got.append, stop))
    th.start()
    for _ in range(100):
        if stub.subs:
            break
        time.sleep(0.01)
    return got, stop, th


def test_ros_frame_source_wiring(monkeypatch):
    stub = _StubRospy()
    wrapper = types.ModuleType("orb_slam3_ros_wrapper")
    wrapper_msg = types.ModuleType("orb_slam3_ros_wrapper.msg")
    wrapper_msg.frame = object
    wrapper.msg = wrapper_msg

    got, stop, th = _run_source(
        ros_node.ROSFrameSource(), stub, monkeypatch,
        [("orb_slam3_ros_wrapper", wrapper),
         ("orb_slam3_ros_wrapper.msg", wrapper_msg)])
    try:
        assert stub.inited == "isdf" and "/frames" in stub.subs
        rng = np.random.default_rng(5)
        bgr = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        depth = rng.integers(0, 999, (12, 16), dtype=np.uint16)
        msg = NS(rgb=_img_msg(bgr), depth=_img_msg(depth),
                 pose=_pose_msg([0.0, 0.0, 0.0], [0, 0, 0, 1]))
        stub.subs["/frames"](msg)
        assert len(got) == 1
        assert np.array_equal(got[0]["image"], bgr[..., ::-1])
    finally:
        stop.set()
        th.join(timeout=2)
    assert not th.is_alive()


def test_ros_franka_source_wiring(monkeypatch):
    stub = _StubRospy()
    geom = types.ModuleType("geometry_msgs")
    geom_msg = types.ModuleType("geometry_msgs.msg")
    geom_msg.Pose = object
    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.Image = object

    cal = [{"camera_ee_pos": [0.1, 0.0, 0.05],
            "camera_ee_ori_rotvec": [0.0, 0.0, np.pi / 2]}]
    got, stop, th = _run_source(
        ros_node.ROSFrankaSource(cal, size_wh=(16, 12)), stub, monkeypatch,
        [("geometry_msgs", geom), ("geometry_msgs.msg", geom_msg),
         ("sensor_msgs", sensor), ("sensor_msgs.msg", sensor_msg)])
    try:
        assert stub.inited == "isdf_franka"
        assert set(stub.subs) == {"/franka/rgb", "/franka/depth",
                                  "/franka/pose"}
        rng = np.random.default_rng(6)
        bgr = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        depth = rng.integers(0, 999, (12, 16), dtype=np.uint16)

        # rgb before depth/pose -> gated, nothing emitted
        stub.subs["/franka/rgb"](_img_msg(bgr))
        assert got == []
        stub.subs["/franka/depth"](_img_msg(depth))
        t, q = rng.normal(size=3), _rand_quat(rng)
        stub.subs["/franka/pose"](_pose_msg(t, q))
        stub.subs["/franka/rgb"](_img_msg(bgr))
        assert len(got) == 1
        f = got[0]
        assert np.array_equal(f["image"], bgr[..., ::-1])
        # the queue carries CAMERA poses: ee_to_cam already applied
        T_ee = np.eye(4)
        T_ee[:3, :3] = Rotation.from_quat(q).as_matrix()
        T_ee[:3, 3] = t
        assert np.allclose(f["T"], ee_to_cam(T_ee, cal), atol=1e-6)
    finally:
        stop.set()
        th.join(timeout=2)
    assert not th.is_alive()


def test_make_dataset_ros_transport_no_rospy():
    """Without rospy the producer process dies at import; the dataset
    itself must still construct (the failure surfaces on first frame
    read, as a timeout — not at wiring time)."""
    from isdf_tpu.data.datasets import make_dataset
    from isdf_tpu.utils.config import Config

    import queue as _queue

    assert not ros_node.rospy_available()
    cfg = Config().replace(dataset_format="realsense",
                           live_transport="ros")
    ds = make_dataset(cfg)
    try:
        # no producer alive -> the queue never fills
        with pytest.raises(_queue.Empty):
            ds.source.queue.q.get(timeout=0.5)
    finally:
        ds.source.close()
