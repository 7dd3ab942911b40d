"""Multi-scene CLI smoke (train/train_multi.py): two synthetic scenes,
one joint program, per-scene artifacts."""

import pytest

pytestmark = pytest.mark.slow

import json
import os


def _scene_cfg(tmp_path, name, preset):
    cfg = {
        "tpu": {"kf_buffer_size": 12},
        "loss": {"bounds_method": "ray"},
        "sample": {"n_rays": 40, "n_strat_samples": 9,
                   "n_surf_samples": 4},
        "model": {
            "hidden_feature_size": 64, "hidden_layers_block": 1,
            "iters_per_frame": 10, "iters_per_kf": 30,
            "embedding": {"n_embed_funcs": 4},
        },
        "eval": {"do_eval": 1, "eval_freq_s": 100.0},
        "dataset": {
            "format": "synthetic",
            "seq_dir": f"/synthetic/{preset}",
            "fps": 30,
            "camera": {"w": 64, "h": 48, "fx": 32.0, "fy": 32.0,
                       "cx": 32.0, "cy": 24.0},
        },
    }
    path = os.path.join(tmp_path, f"{name}.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def test_train_multi_cli(tmp_path):
    from isdf_tpu.train.train_multi import main

    cfg_a = _scene_cfg(str(tmp_path), "a", "room_a")
    cfg_b = _scene_cfg(str(tmp_path), "b", "room_b")
    out_dir = str(tmp_path / "run")

    out = main(["--config", cfg_a, "--config", cfg_b,
                "--save_path", out_dir, "--max_steps", "60",
                "--seed", "3", "--extra_opt_steps", "20"])

    assert len(out) == 2
    for i in range(2):
        sdir = os.path.join(out_dir, f"scene_{i}")
        assert os.path.exists(os.path.join(sdir, "config.json"))
        res = json.load(open(os.path.join(sdir, "res.json")))
        assert res["steps"] > 0
        assert res["n_keyframes"] >= 1
        # final visible-region eval present and finite
        (entry,) = res["sdf_eval"].values()
        assert entry["rays"]["av_l1"] == entry["rays"]["av_l1"]
        # per-scene full-state checkpoint, loadable standalone
        ckpt = os.path.join(sdir, "final.ckpt")
        assert os.path.exists(ckpt)
    from isdf_tpu.serve import SDFQueryEngine
    eng = SDFQueryEngine.from_checkpoint(
        os.path.join(out_dir, "scene_0", "final.ckpt"))
    import numpy as np
    vals = eng.sdf(np.zeros((4, 3), np.float32))
    assert np.isfinite(vals).all()
