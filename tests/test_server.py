"""Web viewer (vis/server.py): endpoints against an analytic SDF grid.

Capability parity target: the reference's interactive apps
(isdf_window.py:29-806, sdf_viewer.py:66-498) — here the interaction
surface is HTTP, so the whole contract is testable headlessly.
"""

import json
import urllib.request

import numpy as np
import pytest

from isdf_tpu.data.synthetic import SyntheticScene
from isdf_tpu.vis.server import SDFWebViewer, ViewerSource


@pytest.fixture(scope="module")
def viewer():
    scene = SyntheticScene(extents=(4.0, 3.0, 4.0))
    d = 24
    axes = [np.linspace(-e / 2, e / 2, d) for e in (4.0, 3.0, 4.0)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    grid = scene.sdf_np(pts.reshape(-1, 3)).reshape(d, d, d)
    src = ViewerSource.from_grid(grid, extents=(4.0, 3.0, 4.0),
                                 sdf_fn=scene.sdf_np, up_ix=1)
    v = SDFWebViewer(src, port=0).start()
    yield v
    v.stop()


def _get(viewer, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{viewer.port}{path}", timeout=30) as r:
        return r.status, r.read()


def test_index_and_meta(viewer):
    code, body = _get(viewer, "/")
    assert code == 200 and b"isdf_tpu SDF viewer" in body
    code, body = _get(viewer, "/api/meta")
    meta = json.loads(body)
    assert meta["shape"] == [24, 24, 24]
    assert meta["n_slices"] == 24 and meta["up_ix"] == 1
    assert meta["live"] is False
    assert meta["row_axis"] == 0 and meta["col_axis"] == 2


def test_slice_png_and_clipping(viewer):
    code, body = _get(viewer, "/api/slice/12.png")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    # out-of-range index clips rather than erroring
    code, _ = _get(viewer, "/api/slice/999.png")
    assert code == 200


def test_query_matches_analytic_sdf(viewer):
    scene = SyntheticScene(extents=(4.0, 3.0, 4.0))
    code, body = _get(viewer, "/api/query?i=12&r=7&c=3")
    q = json.loads(body)
    assert code == 200
    pt = np.asarray(q["point"], np.float32)
    # up_ix=1: slice index 12 fixes axis 1, r -> axis 0, c -> axis 2
    np.testing.assert_allclose(pt[0], np.linspace(-2, 2, 24)[7], atol=1e-3)
    np.testing.assert_allclose(pt[1], np.linspace(-1.5, 1.5, 24)[12],
                               atol=1e-3)
    np.testing.assert_allclose(pt[2], np.linspace(-2, 2, 24)[3], atol=1e-3)
    want = float(scene.sdf_np(pt[None]).reshape(-1)[0])
    assert abs(q["sdf"] - want) < 1e-3
    # grid value at the lattice point agrees with the exact query
    assert abs(q["grid_sdf"] - want) < 1e-3


def test_mesh_render_and_cache(viewer):
    code, body = _get(viewer, "/api/render.png?azim=30&elev=20")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    code, body2 = _get(viewer, "/api/render.png?azim=30&elev=20")
    assert code == 200 and body2 == body  # served from cache


def test_status_and_refresh_offline(viewer):
    code, body = _get(viewer, "/api/status")
    s = json.loads(body)
    assert code == 200 and s["live"] is False
    code, body = _get(viewer, "/api/refresh")
    assert json.loads(body) == {"refreshed": False}


def test_unknown_route_404(viewer):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(viewer, "/api/nope")
    assert ei.value.code == 404


def test_viewer_source_from_trainer_surface():
    """from_trainer snapshots shapes correctly (tiny trainer, CPU)."""
    from isdf_tpu.data.synthetic import SyntheticDataset
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import Config

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=8, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    tr = Trainer(cfg, dataset=ds, seed=0, grid_dim=16)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])

    src = ViewerSource.from_trainer(tr, loop_attached=True)
    assert src.grid.shape == (16, 16, 16)
    v = SDFWebViewer(src, port=0).start()
    try:
        code, body = _get(v, "/api/status")
        s = json.loads(body)
        assert s["live"] is True and s["keyframes"] == 1
        code, body = _get(v, "/api/keyframes.png")
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        old_version = json.loads(_get(v, "/api/meta")[1])["version"]
        # live refresh is deferred: the HTTP thread must never dispatch
        # device evals (the step bundle donates trainer.params) — the
        # route marks the request pending and the training loop's
        # monitor hook performs the snapshot
        code, body = _get(v, "/api/refresh")
        r = json.loads(body)
        assert r["refreshed"] is False and r["pending"] is True
        out = src.refresh_if_watched()   # the monitor-hook tick
        assert out["refreshed"] is True
        assert out["version"] == old_version + 1
        # monitor-hook path: idle viewer (no request since last snapshot)
        # must not re-evaluate the grid; any request re-arms it
        assert src.refresh_if_watched() == {"refreshed": False}
        assert json.loads(
            _get(v, "/api/status")[1])["version"] == old_version + 1
        assert src.refresh_if_watched()["refreshed"] is True
        # live click-to-query reads the snapshot grid, never the device
        def _boom(_pts):
            raise AssertionError("live query must not touch the device")
        src.sdf_fn = _boom
        code, body = _get(v, "/api/query?i=8&r=8&c=8")
        q = json.loads(body)
        assert code == 200 and q["sdf"] == q["grid_sdf"]
    finally:
        v.stop()

    # standalone server over the same trainer (checkpoint-serving mode,
    # loop_attached=False): this server owns the device, so refresh is
    # inline and queries use the exact sdf_fn
    src2 = ViewerSource.from_trainer(tr)
    v2 = SDFWebViewer(src2, port=0).start()
    try:
        old = json.loads(_get(v2, "/api/meta")[1])["version"]
        r = json.loads(_get(v2, "/api/refresh")[1])
        assert r["refreshed"] is True and r["version"] == old + 1
        q = json.loads(_get(v2, "/api/query?i=8&r=8&c=8")[1])
        want = float(np.asarray(tr.sdf_fn(
            np.asarray(q["point"], np.float32)[None])).reshape(-1)[0])
        assert abs(q["sdf"] - want) < 1e-3
    finally:
        v2.stop()


def _post(viewer, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{viewer.port}{path}",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_control_endpoint_roundtrip(viewer):
    """POST /api/control updates the training controls (reference
    isdf_window.py:546-712: play/pause, iters slider, content toggles)
    and GET reads them back."""
    code, c = _get(viewer, "/api/control"), None
    c = json.loads(code[1])
    assert c == {"paused": False, "iters_per_step": 0,
                 "do_mesh": True, "do_slices": True,
                 "scene_mesh": True, "scene_frustums": True,
                 "scene_traj": True, "scene_pc": False}
    code, c = _post(viewer, "/api/control",
                    {"paused": True, "iters_per_step": 25,
                     "do_mesh": False})
    assert code == 200
    assert c["paused"] is True and c["iters_per_step"] == 25
    assert c["do_mesh"] is False and c["do_slices"] is True
    c2 = json.loads(_get(viewer, "/api/control")[1])
    assert c2 == c
    # clamping + partial updates
    _, c3 = _post(viewer, "/api/control", {"iters_per_step": -5})
    assert c3["iters_per_step"] == 0 and c3["paused"] is True
    # restore for other tests
    _post(viewer, "/api/control", {"paused": False, "do_mesh": True})


def test_control_endpoint_rejects_garbage(viewer):
    import urllib.error
    req = urllib.request.Request(
        f"http://127.0.0.1:{viewer.port}/api/control",
        data=b"not json", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(viewer, "/api/control", {"iters_per_step": "abc"})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(viewer, "/api/nope", {})
    assert ei.value.code == 404


def test_controls_honored_by_live_loop():
    """A live train_loop honors pause/resume and the iters-per-step cap
    through the control_hook (the train_vis --serve wiring)."""
    import threading
    import time

    from isdf_tpu.data.synthetic import SyntheticDataset
    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import Config

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=8, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    tr = Trainer(cfg, dataset=ds, seed=0, grid_dim=16)

    src = ViewerSource.from_trainer(tr, loop_attached=True)
    v = SDFWebViewer(src, port=0).start()
    try:

        def control_hook():
            c = src.get_controls()
            if c.get("paused"):
                src.refresh_if_watched()
            return c

        # start paused via the HTTP surface
        _post(v, "/api/control", {"paused": True, "iters_per_step": 3})
        out = {}

        def run():
            out["res"] = train_loop(tr, max_steps=12,
                                    control_hook=control_hook)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        time.sleep(1.0)
        assert tr.steps_taken == 0, "paused loop must not step"
        # resume over HTTP; the loop finishes its 12 steps
        _post(v, "/api/control", {"paused": False})
        th.join(timeout=120)
        assert not th.is_alive()
        res = out["res"]
        assert res.steps == 12
        # iters_per_step=3 caps every bundle: 12 steps over >= 4 rounds
        assert res.rounds >= 4
    finally:
        v.stop()


def test_scene_png_offline(viewer):
    """/api/scene.png: the navigable 3D composite view renders from a
    grid-only source (mesh only) and the mesh toggle changes it."""
    code, body = _get(viewer, "/api/scene.png?azim=30&elev=20&zoom=1")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    # same view served from cache
    code, body2 = _get(viewer, "/api/scene.png?azim=30&elev=20&zoom=1")
    assert body2 == body
    # zoom is part of the camera: a different zoom renders differently
    code, body3 = _get(viewer, "/api/scene.png?azim=30&elev=20&zoom=2")
    assert body3 != body
    _post(viewer, "/api/control", {"scene_mesh": False})
    try:
        code, body4 = _get(viewer,
                           "/api/scene.png?azim=30&elev=20&zoom=1")
        assert code == 200 and body4 != body  # empty scene render
    finally:
        _post(viewer, "/api/control", {"scene_mesh": True})


def test_scene_png_live_composite():
    """Live trainer: the composite must change when a keyframe is added
    (new frustum + trajectory point) and honor the content toggles
    round-tripped through /api/control (reference isdf_window.py's
    widget3d scene + its checkboxes)."""
    from isdf_tpu.data.synthetic import SyntheticDataset
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import Config

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=8, n_strat_samples=5,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=8, H=24, W=32)
    tr = Trainer(cfg, dataset=ds, seed=0, grid_dim=16)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])

    src = ViewerSource.from_trainer(tr, loop_attached=True)
    v = SDFWebViewer(src, port=0).start()
    try:
        code, one_kf = _get(v, "/api/scene.png?azim=45&elev=25")
        assert code == 200 and one_kf[:8] == b"\x89PNG\r\n\x1a\n"

        # render changes when a keyframe is added
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([4])[0])
        code, two_kf = _get(v, "/api/scene.png?azim=45&elev=25")
        assert code == 200 and two_kf != one_kf

        # toggles round-trip and change the render
        code, ctl = _post(v, "/api/control",
                          {"scene_frustums": False, "scene_pc": True})
        assert ctl["scene_frustums"] is False and ctl["scene_pc"] is True
        assert json.loads(_get(v, "/api/control")[1])[
            "scene_frustums"] is False
        code, toggled = _get(v, "/api/scene.png?azim=45&elev=25")
        assert code == 200 and toggled != two_kf
    finally:
        v.stop()
