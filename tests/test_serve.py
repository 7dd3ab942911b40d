"""SDF query service (serve.py): engine equality vs the Trainer's own
query path, checkpoint-only loading (incl. the stored scene transform),
and the HTTP JSON API.

Capability target: the reference's map queries (trainer.py:2066-2078) and
collision costs (metrics.py:95-113) exposed as a serving product.
"""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
from isdf_tpu.engine.trainer import Trainer
from isdf_tpu.eval.metrics import chomp_cost, linear_cost
from isdf_tpu.serve import SDFQueryEngine, SDFQueryServer
from isdf_tpu.utils import checkpoint as CK
from isdf_tpu.utils.config import Config


@pytest.fixture(scope="module")
def trained():
    scene = SyntheticScene(extents=(5.0, 3.0, 4.0))
    ds = SyntheticDataset(scene, n_frames=20, H=32, W=48)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=40, n_strat_samples=7,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=8)
    tr = Trainer(cfg, dataset=ds, seed=3, grid_dim=48)
    for fid in [0, 5, 10]:
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([fid])[0])
    tr.run_steps(20)
    return tr


def _pts(n, seed=0):
    return np.random.default_rng(seed).uniform(
        -1.5, 1.5, (n, 3)).astype(np.float32)


def test_engine_matches_trainer_queries(trained):
    eng = SDFQueryEngine.from_trainer(trained)
    pts = _pts(300)
    np.testing.assert_allclose(eng.sdf(pts), trained.sdf_fn(pts), atol=1e-6)
    np.testing.assert_allclose(eng.grad(pts), trained.grad_fn(pts),
                               atol=1e-5)


def test_engine_multi_chunk_path(trained):
    """A request larger than one chunk goes through the lax.map executor
    and must agree with the single-chunk path."""
    eng_small = SDFQueryEngine.from_trainer(trained, chunk_size=64)
    eng_big = SDFQueryEngine.from_trainer(trained, chunk_size=1 << 16)
    pts = _pts(300, seed=1)  # 300 > 64 -> 8 chunks (pow2 bucket)
    np.testing.assert_allclose(eng_small.sdf(pts), eng_big.sdf(pts),
                               atol=1e-6)
    np.testing.assert_allclose(eng_small.grad(pts), eng_big.grad(pts),
                               atol=1e-5)


def test_engine_costs_and_collision(trained):
    eng = SDFQueryEngine.from_trainer(trained)
    pts = _pts(100, seed=2)
    sdf = eng.sdf(pts)
    np.testing.assert_allclose(eng.chomp_cost(pts, epsilon=1.5),
                               chomp_cost(sdf, epsilon=1.5), atol=1e-6)
    np.testing.assert_allclose(eng.linear_cost(pts, epsilon=1.0),
                               linear_cost(sdf, epsilon=1.0), atol=1e-6)
    col = eng.collision(pts, margin=float(sdf.max()) + 1.0)
    assert col["collides"] and col["n_below"] == len(pts)
    col = eng.collision(pts, margin=float(sdf.min()) - 1.0)
    assert not col["collides"] and col["n_below"] == 0
    assert np.isclose(col["min_sdf"], sdf.min())
    assert col["argmin"] == int(sdf.argmin())


def test_engine_input_validation(trained):
    eng = SDFQueryEngine.from_trainer(trained)
    with pytest.raises(ValueError):
        eng.sdf(np.zeros((4, 2), np.float32))
    import isdf_tpu.serve as SV
    with pytest.raises(ValueError):
        eng.sdf(np.zeros((SV.MAX_POINTS + 1, 3), np.float32))
    # JSON accepts NaN/Infinity tokens; they must be rejected, not served
    bad = np.zeros((4, 3), np.float32)
    bad[2, 1] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        eng.sdf(bad)
    bad[2, 1] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        eng.grad(bad)


def test_from_checkpoint_no_config(trained, tmp_path):
    """The archive alone (model description + scene transform stored in
    meta) reproduces the trainer's queries — no Config, no dataset."""
    path = str(tmp_path / "map.npz")
    CK.save_checkpoint(path, trained, step=20)
    eng = SDFQueryEngine.from_checkpoint(path)
    pts = _pts(200, seed=3)
    np.testing.assert_allclose(eng.sdf(pts), trained.sdf_fn(pts), atol=1e-6)
    np.testing.assert_allclose(eng.grad(pts), trained.grad_fn(pts),
                               atol=1e-5)
    assert eng.info()["step"] == 20


def test_from_checkpoint_nontrivial_transform(trained, tmp_path):
    """The scene transform is part of the map: serving a checkpoint saved
    under a rotated/scaled domain must apply that domain's inverse
    transform, not the identity."""
    tr = trained
    saved = (tr.bounds_transform_np.copy(), tr.scene_extents_np.copy())
    a = np.deg2rad(30.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                          [-np.sin(a), 0, np.cos(a)]], np.float32)
    T[:3, 3] = [0.3, -0.2, 0.1]
    try:
        tr.set_scene_properties(T, np.array([5.0, 3.0, 4.0], np.float32))
        path = str(tmp_path / "rot.npz")
        CK.save_checkpoint(path, tr, step=21)
        eng = SDFQueryEngine.from_checkpoint(path)
        pts = _pts(150, seed=4)
        np.testing.assert_allclose(eng.sdf(pts), tr.sdf_fn(pts), atol=1e-6)

        # and load_checkpoint restores the domain into a fresh trainer
        tr2 = Trainer(tr.cfg, dataset=tr.dataset, seed=99, grid_dim=48)
        assert not np.allclose(tr2.bounds_transform_np, T)
        CK.load_checkpoint(path, tr2)
        np.testing.assert_allclose(tr2.bounds_transform_np, T)
        np.testing.assert_allclose(tr2.sdf_fn(pts), tr.sdf_fn(pts),
                                   atol=1e-6)
    finally:  # module-scoped fixture: undo the domain mutation
        tr.set_scene_properties(*saved)


def test_refresh_from_trainer(trained):
    eng = SDFQueryEngine.from_trainer(trained)
    pts = _pts(50, seed=5)
    before = eng.sdf(pts)
    # module-scoped fixture: snapshot the training state so advancing it
    # here cannot leak into tests that run later (order-independence)
    saved = (SDFQueryEngine._snapshot(trained.params),
             SDFQueryEngine._snapshot(trained.opt_state),
             trained.tot_step_time, trained.steps_since_frame)
    try:
        trained.run_steps(5)
        # engine still serves the old params pytree until refreshed
        np.testing.assert_allclose(eng.sdf(pts), before, atol=1e-6)
        eng.refresh_from_trainer(trained)
        np.testing.assert_allclose(eng.sdf(pts), trained.sdf_fn(pts),
                                   atol=1e-6)
    finally:
        (trained.params, trained.opt_state,
         trained.tot_step_time, trained.steps_since_frame) = saved


def test_from_checkpoint_bf16_compute_dtype(tmp_path):
    """A bfloat16-trained map must be served with bfloat16 hidden compute:
    the archive stores compute_dtype and from_checkpoint restores it, so
    checkpoint-served SDF values equal the live trainer's queries."""
    import jax.numpy as jnp
    scene = SyntheticScene(extents=(5.0, 3.0, 4.0))
    ds = SyntheticDataset(scene, n_frames=10, H=32, W=48)
    cfg = Config().replace(
        dataset_format="synthetic", n_rays=40, n_strat_samples=7,
        n_surf_samples=3, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=8, compute_dtype="bfloat16")
    tr = Trainer(cfg, dataset=ds, seed=5, grid_dim=48)
    assert tr.model.compute_dtype == jnp.bfloat16
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    tr.run_steps(10)

    path = str(tmp_path / "bf16.npz")
    CK.save_checkpoint(path, tr, step=10)
    eng = SDFQueryEngine.from_checkpoint(path)
    assert eng.model.compute_dtype == jnp.bfloat16
    pts = _pts(200, seed=8)
    np.testing.assert_allclose(eng.sdf(pts), tr.sdf_fn(pts), atol=1e-6)
    np.testing.assert_allclose(eng.grad(pts), tr.grad_fn(pts), atol=1e-5)

    # the config-override branch must honour compute_dtype too
    eng2 = SDFQueryEngine.from_checkpoint(path, config=cfg)
    assert eng2.model.compute_dtype == jnp.bfloat16
    np.testing.assert_allclose(eng2.sdf(pts), tr.sdf_fn(pts), atol=1e-6)


# ------------------------------------------------------------------ http
@pytest.fixture(scope="module")
def server(trained):
    srv = SDFQueryServer(SDFQueryEngine.from_trainer(trained),
                         port=0).start()
    yield srv
    srv.stop()


def _post(srv, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_http_healthz(server, trained):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["ok"] and info["param_count"] > 0


def test_http_sdf_grad_query(server, trained):
    pts = _pts(40, seed=6)
    code, out = _post(server, "/sdf", {"points": pts.tolist()})
    assert code == 200
    np.testing.assert_allclose(out["sdf"], trained.sdf_fn(pts), atol=1e-5)

    code, out = _post(server, "/grad", {"points": pts.tolist()})
    np.testing.assert_allclose(out["grad"], trained.grad_fn(pts), atol=1e-4)

    code, out = _post(server, "/query",
                      {"points": pts.tolist(), "epsilon": 1.5})
    sdf = np.asarray(out["sdf"])
    np.testing.assert_allclose(out["chomp_cost"],
                               chomp_cost(sdf, epsilon=1.5), atol=1e-6)
    assert "grad" in out
    code, out = _post(server, "/query",
                      {"points": pts.tolist(), "grad": False})
    assert "grad" not in out


def test_http_collision_and_errors(server, trained):
    pts = _pts(30, seed=7)
    code, out = _post(server, "/collision",
                      {"points": pts.tolist(), "margin": 100.0})
    assert code == 200 and out["collides"] and out["n_below"] == 30

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/sdf", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/sdf", {"points": [[0.0, 0.0]]})  # bad shape
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", {"points": [[0.0, 0.0, 0.0]]})
    assert e.value.code == 404


# ---------------------------------------------------------------- multi-map
@pytest.fixture(scope="module")
def fleet_server(trained):
    """Two maps behind one service: the trained map and an untrained
    sibling (different params -> distinguishable responses)."""
    eng_a = SDFQueryEngine.from_trainer(trained)
    scene = SyntheticScene(extents=(4.0, 2.6, 6.0))
    ds = SyntheticDataset(scene, n_frames=4, H=32, W=48)
    tr_b = Trainer(trained.cfg, dataset=ds, seed=9, grid_dim=48)
    eng_b = SDFQueryEngine.from_trainer(tr_b)
    srv = SDFQueryServer({"robot_a": eng_a, "robot_b": eng_b},
                         port=0).start()
    yield srv, eng_a, eng_b
    srv.stop()


def test_http_multi_map_routes(fleet_server):
    srv, eng_a, eng_b = fleet_server
    pts = _pts(25, seed=11)
    code, out_a = _post(srv, "/scene/robot_a/sdf", {"points": pts.tolist()})
    assert code == 200
    np.testing.assert_allclose(out_a["sdf"], eng_a.sdf(pts), atol=1e-5)
    code, out_b = _post(srv, "/scene/robot_b/sdf", {"points": pts.tolist()})
    np.testing.assert_allclose(out_b["sdf"], eng_b.sdf(pts), atol=1e-5)
    assert not np.allclose(out_a["sdf"], out_b["sdf"])

    # healthz enumerates the fleet; per-scene healthz works
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert set(info["scenes"]) == {"robot_a", "robot_b"}
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/scene/robot_b/healthz",
            timeout=30) as r:
        assert json.loads(r.read())["ok"]


def test_http_multi_map_errors(fleet_server):
    srv, _, _ = fleet_server
    pts = [[0.0, 0.0, 0.0]]
    # bare route is ambiguous with >1 scene
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/sdf", {"points": pts})
    assert e.value.code == 404
    assert "scenes" in json.loads(e.value.read())
    # unknown scene 404s with the available names
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/scene/nope/sdf", {"points": pts})
    assert e.value.code == 404


def test_single_map_bare_routes_unchanged(trained):
    """Back-compat: one engine (dict or bare) keeps serving bare routes."""
    srv = SDFQueryServer({"only": SDFQueryEngine.from_trainer(trained)},
                         port=0).start()
    try:
        pts = _pts(10, seed=12)
        code, out = _post(srv, "/sdf", {"points": pts.tolist()})
        assert code == 200 and len(out["sdf"]) == 10
        # the named route works too
        code, out2 = _post(srv, "/scene/only/sdf", {"points": pts.tolist()})
        np.testing.assert_allclose(out2["sdf"], out["sdf"])
    finally:
        srv.stop()


def test_ensemble_engine(trained, tmp_path):
    """EnsembleEngine averages member predictions and serves unchanged
    through the HTTP layer (the ensemble_quality deployment shape)."""
    from isdf_tpu.serve import EnsembleEngine

    eng_a = SDFQueryEngine.from_trainer(trained)
    # second member: same scene/model, perturbed params (a different
    # seed's map stand-in)
    import jax
    import jax.numpy as jnp
    tr_like = SDFQueryEngine.from_trainer(trained)
    tr_like.params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), tr_like.params)
    ens = EnsembleEngine([eng_a, tr_like])

    pts = _pts(50, seed=13)
    np.testing.assert_allclose(
        ens.sdf(pts), 0.5 * (eng_a.sdf(pts) + tr_like.sdf(pts)),
        atol=1e-6)
    np.testing.assert_allclose(
        ens.grad(pts), 0.5 * (eng_a.grad(pts) + tr_like.grad(pts)),
        atol=1e-6)
    col = ens.collision(pts, margin=100.0)
    assert col["collides"] and col["n_below"] == 50
    info = ens.info()
    assert info["ensemble"] == 2 and len(info["members"]) == 2

    srv = SDFQueryServer(ens, port=0).start()
    try:
        code, out = _post(srv, "/sdf", {"points": pts.tolist()})
        assert code == 200
        np.testing.assert_allclose(out["sdf"], ens.sdf(pts), atol=1e-5)
    finally:
        srv.stop()
