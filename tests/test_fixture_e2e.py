"""End-to-end dress rehearsal of the real-data benchmark pipeline.

Synthesizes a ReplicaCAD-format fixture on disk (isdf_tpu/data/fixtures.py)
and runs the UNMODIFIED product path the reference ships:
``train.py --config X.json`` → ``vox_res.json`` (fixed voxblox protocol,
reference isdf/train/train.py:19-279 + isdf/eval/eval_pts.py:96-299) →
the figure pipeline (reference isdf/eval/figs/{all_seq,per_seq}.py).

This is the integration contract for the day real ReplicaCAD/ScanNet
data is mounted: everything between the PNG readers and the figure
writers executes here exactly as it would there.
"""

import json
import os

import numpy as np
import pytest

from isdf_tpu.data.fixtures import write_replicaCAD_fixture

pytestmark = pytest.mark.slow

VOX_REGIONS = ["rays", "visible_surf", "vol", "objects"]


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("replicaCAD_fixture")
    cfg_path = write_replicaCAD_fixture(
        str(root), preset="room_a", n_frames=45, H=48, W=64,
        grid_dim=48, mesh_dim=48, eval_times=(0.5, 1.4),
        eval_samples=20000, hidden_size=64, n_embed_funcs=3,
        n_rays=100, depth_noise_std=0.003)
    return cfg_path


@pytest.fixture(scope="module")
def run_dir(fixture_cfg, tmp_path_factory):
    out = tmp_path_factory.mktemp("runs") / "room_a_nav_0"
    from isdf_tpu.train.train import main
    # --sim_dt pins the simulated clock to the reference's real-time
    # budget (300 steps/s, SURVEY.md section 6) so the keyframe cadence
    # is deterministic and host-speed-independent
    main(["--config", fixture_cfg, "--save_path", str(out),
          "--max_steps", "1200", "--sim_dt", str(1 / 300), "--seed", "1"])
    return str(out)


def test_fixture_layout(fixture_cfg):
    cfg = json.load(open(fixture_cfg))
    seq_dir = cfg["dataset"]["seq_dir"]
    assert os.path.exists(os.path.join(seq_dir, "traj.txt"))
    assert os.path.exists(os.path.join(seq_dir, "results",
                                       "ndepth000000.png"))
    assert os.path.exists(os.path.join(seq_dir, "results",
                                       "frame000044.png"))
    gt = cfg["dataset"]["gt_sdf_dir"]
    assert os.path.exists(os.path.join(gt, "1cm", "sdf.npy"))
    assert os.path.exists(os.path.join(gt, "1cm", "transform.txt"))
    assert os.path.exists(os.path.join(gt, "mesh.obj"))
    root = cfg["eval"]["eval_pts_root"]
    d = os.path.join(root, "vox", "0.055", "room_a_nav", "eval_pts")
    times = sorted(os.listdir(d))
    assert times == ["0.500", "1.400"]
    for n in ["surf_valid_gt_sdf", "surf_valid_vox_sdf", "vis_valid_gt_sdf",
              "vis_valid_vox_sdf", "vis_valid_gt_grad",
              "vis_valid_vox_grad"]:
        assert os.path.exists(os.path.join(d, "0.500", n + ".npy"))
    assert os.path.exists(os.path.join(root, "full_vol", "replicaCAD.npy"))
    assert os.path.exists(os.path.join(root, "full_vol",
                                       "gt_room_a_nav.npy"))


def test_depth_roundtrip(fixture_cfg):
    """Written uint16 PNGs decode back to metres within quantisation."""
    from isdf_tpu.data.datasets import ReplicaDataset
    from isdf_tpu.utils.config import load_config
    cfg = load_config(fixture_cfg)
    ds = ReplicaDataset(cfg.seq_dir, cfg)
    s = ds[0]
    d = s["depth"]
    assert d.shape == (48, 64)
    assert (d >= 0).all() and d.max() < 12.0
    assert (d > 0).mean() > 0.5  # the room is visible


def test_scene_bounds_from_mesh_obj(fixture_cfg):
    """The trainer derives the training domain from gt_sdf_dir/mesh.obj
    (reference trainer.py:207,80-86) — not the 6 m bootstrap cube."""
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import load_config
    tr = Trainer(load_config(fixture_cfg), incremental=True, grid_dim=32)
    assert tr.gt_scene
    # room_a extents (6.0, 3.0, 4.5) up to axis permutation
    got = np.sort(tr.scene_extents_np)
    want = np.sort([6.0, 3.0, 4.5])
    assert np.allclose(got, want, atol=0.4)
    assert tr.eval_times == [0.5, 1.4]
    assert tr.eval_pts_dir is not None


def test_vox_res_schema_and_quality(run_dir):
    path = os.path.join(run_dir, "vox_res.json")
    assert os.path.exists(path), "vox_res.json was not written"
    vox = json.load(open(path))
    assert len(vox) == 2
    for t_key, entry in vox.items():
        for region in VOX_REGIONS:
            assert region in entry, f"missing region {region} at {t_key}"
        for split in ("vis", "vox"):
            r = entry["rays"][split]
            assert np.isfinite(r["av_l1"]), (t_key, split)
            assert len(r["l1_chomp_costs"]) == 3
            assert len(r["av_cossim"]) == 2
            s = entry["visible_surf"][split]
            assert np.isfinite(s["av_l1"])
        assert np.isfinite(entry["vol"]["av_l1"])
        assert len(entry["objects"]["l1"]) == 4  # 2 spheres + 2 boxes
    # trained-map sanity: the final visible-region MAE is decimetre-scale
    last = vox[sorted(vox, key=float)[-1]]
    assert last["rays"]["vis"]["av_l1"] < 0.30
    # the vox split is a strict, non-empty subset (different value)
    assert last["rays"]["vox"]["av_l1"] != last["rays"]["vis"]["av_l1"]


def test_res_json_written(run_dir):
    res = json.load(open(os.path.join(run_dir, "res.json")))
    assert "sdf_eval" in res and len(res["sdf_eval"]) >= 1
    assert "kf_indices" in res
    entry = list(res["sdf_eval"].values())[-1]
    assert np.isfinite(entry["rays"]["av_l1"])


def test_figs_pipeline(run_dir, tmp_path):
    """vox_res.json feeds the figure layer unmodified."""
    from isdf_tpu.eval import figs
    run = figs.load_run(run_dir)
    assert run is not None
    ts, vals = figs.curve(run)
    assert len(ts) == 2 and np.isfinite(vals).all()
    per_seq_png = tmp_path / "per_seq.png"
    figs.plot_per_seq(run_dir, str(per_seq_png))
    assert per_seq_png.exists() and per_seq_png.stat().st_size > 1000
    all_seq_png = tmp_path / "all_seq.png"
    figs.plot_all_seq(os.path.dirname(run_dir), str(all_seq_png))
    assert all_seq_png.exists() and all_seq_png.stat().st_size > 1000
