"""ScanNet-format dress rehearsal: the exported-scan layout
(frames/color|depth|pose + scene info txt, reference
isdf/datasets/dataset.py:74-121 + trainer.py:335-346) through the
unmodified train CLI into vox_res.json, with the ScanNet protocol
specifics: |grid| GT (trainer.py:448-449) and dist_behind_surf = 0
in the fixed eval (eval_pts.py fixed_pts_eval)."""

import json
import os

import numpy as np
import pytest

from isdf_tpu.data.fixtures import write_scannet_fixture

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_fixture")
    return write_scannet_fixture(
        str(root), preset="room_c", n_frames=36, H=48, W=64,
        grid_dim=48, mesh_dim=48, eval_times=(0.4, 1.0),
        eval_samples=20000, hidden_size=64, n_embed_funcs=3,
        n_rays=100, depth_noise_std=0.002)


def test_layout_and_trainer_bringup(fixture_cfg):
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import load_config
    cfg = load_config(fixture_cfg)
    assert cfg.dataset_format == "ScanNet"
    d = os.path.join(cfg.scannet_dir, "frames")
    assert os.path.exists(os.path.join(d, "color", "0.jpg"))
    assert os.path.exists(os.path.join(d, "depth", "35.png"))
    assert os.path.exists(os.path.join(d, "pose", "35.txt"))
    tr = Trainer(cfg, incremental=True, grid_dim=32)
    # camera came from the scene info txt, not the config defaults
    assert (tr.H, tr.W) == (48, 64)
    assert tr.gt_scene  # bounds from gt_sdf_dir/mesh.obj
    assert tr.eval_times == [0.4, 1.0]
    # ScanNet GT is |grid|: strictly non-negative everywhere finite
    pts = np.asarray(tr.grid_pc)[::971][:500]
    gt = np.asarray(tr.gt_sdf_fn(pts))
    assert np.nanmin(gt) >= 0.0


def test_cli_to_vox_res(fixture_cfg, tmp_path):
    from isdf_tpu.train.train import main
    out = tmp_path / "scene_room_c_0"
    main(["--config", fixture_cfg, "--save_path", str(out),
          "--max_steps", "800", "--sim_dt", str(1 / 300), "--seed", "1"])
    vox = json.load(open(out / "vox_res.json"))
    assert len(vox) == 2
    last = vox[sorted(vox, key=float)[-1]]
    for region in ("rays", "visible_surf", "vol", "objects"):
        assert region in last or region == "objects"  # no obj_bounds.txt
    assert np.isfinite(last["rays"]["vis"]["av_l1"])
    assert np.isfinite(last["rays"]["vox"]["av_l1"])
    # |GT| near the surface is small; a trained map tracks it
    assert last["visible_surf"]["vis"]["av_l1"] < 0.3
