import glob
import json

import pytest

from isdf_tpu.utils.config import Config, config_from_dict, load_config

REF_CONFIGS = sorted(glob.glob("/root/reference/isdf/train/configs/*.json"))


@pytest.mark.parametrize("path", REF_CONFIGS,
                         ids=[p.split("/")[-1] for p in REF_CONFIGS])
def test_parses_reference_configs(path):
    cfg = load_config(path)
    assert cfg.window_size >= 2
    assert cfg.bounds_method in ("ray", "normal", "pc")
    assert cfg.n_samples_per_ray > 0
    assert cfg.embedding_size == 2 * 21 * (cfg.n_embed_funcs + 1) + 3


def test_replicaCAD_values_flattened_exactly():
    cfg = load_config("/root/reference/isdf/train/configs/replicaCAD.json")
    with open("/root/reference/isdf/train/configs/replicaCAD.json") as f:
        raw = json.load(f)
    assert cfg.lr == raw["optimiser"]["lr"]
    assert cfg.trunc_weight == raw["loss"]["trunc_weight"]
    assert cfg.trunc_distance == raw["loss"]["trunc_distance"]
    assert cfg.n_rays == raw["sample"]["n_rays"]
    assert cfg.n_strat_samples == 19 and cfg.n_surf_samples == 8
    assert cfg.iters_per_kf == 60 and cfg.iters_per_frame == 10
    assert cfg.scale_input == raw["model"]["embedding"]["scale_input"]
    assert cfg.noise_kf == raw["model"]["noise_kf"]
    assert cfg.fps == 30
    assert cfg.depth_scale == raw["dataset"]["depth_scale"]
    assert cfg.camera.w == 1200 and cfg.camera.h == 680
    assert cfg.do_normal  # grad_weight != 0
    assert cfg.embedding_size == 255
    # paths resolved relative to the config file
    assert cfg.seq_dir.startswith("/root/reference/")


def test_old_schema_sdf_supervision_key():
    # shipped exp0 results use "sdf_supervision" at top level
    cfg = config_from_dict({"sdf_supervision": "pc"})
    assert cfg.bounds_method == "pc"


def test_defaults_round_trip():
    cfg = Config()
    assert cfg.n_samples_per_ray == 27
    assert cfg.embedding_size == 255
    cfg2 = cfg.replace(n_embed_funcs=6)
    assert cfg2.embedding_size == 2 * 21 * 7 + 3


def test_workspace_rotate_and_offset_applied():
    """workspace.rotate_z/offset reach the scene transform (reference
    trainer.py:114-119); center is kept for visualisation."""
    import numpy as np

    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.utils.config import Config

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=8, n_strat_samples=3,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=2,
        workspace_center=(1.0, 2.0, 3.0),
        workspace_extents=(2.0, 2.0, 2.0),
        workspace_rotate_z=90.0,
        workspace_offset=(0.5, 0.0, 0.0))

    inner = SyntheticDataset(SyntheticScene(), n_frames=2, H=16, W=24)

    class NoBounds:  # hide scene_bounds -> force the workspace branch
        def __init__(self, ds):
            self._ds = ds
            self.camera = ds.camera

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, i):
            return self._ds[i]

    tr = Trainer(cfg, dataset=NoBounds(inner), seed=0)
    T = tr.bounds_transform_np
    # Rz(90): x axis -> y axis
    assert np.allclose(T[:3, 0], [0, 1, 0], atol=1e-6)
    assert np.allclose(T[:3, 3], [0.5, 0.0, 0.0], atol=1e-6)
    assert np.allclose(tr.scene_center, [1.0, 2.0, 3.0])


def test_apply_overrides_and_cli_set():
    from isdf_tpu.utils.config import apply_overrides

    d = {"sample": {"n_rays": 200}}
    apply_overrides(d, ["sample.n_rays=400",           # typed int
                        "dataset.live_transport=ros",  # bare string
                        "optimiser.lr=0.0007",         # float
                        "tpu.do_active=true",          # bool
                        "sample.depth_range=[0.1, 9]"])  # list
    assert d["sample"]["n_rays"] == 400
    assert d["dataset"]["live_transport"] == "ros"  # section created
    assert d["optimiser"]["lr"] == 0.0007
    assert d["tpu"]["do_active"] is True
    assert d["sample"]["depth_range"] == [0.1, 9]
    with pytest.raises(ValueError):
        apply_overrides(d, ["no_equals_sign"])

    # through load_config: the same path the CLIs' --set flag uses
    cfg = load_config("isdf_tpu/train/configs/synthetic.json",
                      overrides=["sample.n_rays=123",
                                 "dataset.live_transport=ros",
                                 "tpu.step_rate_cap=123"])
    assert cfg.n_rays == 123 and cfg.live_transport == "ros"
    assert cfg.step_rate_cap == 123


def test_launch_files_reference_real_entry_points():
    """The catkin launch files (capability match for isdf/launch/*) must
    stay consistent with the package: well-formed XML, node types that
    exist, config paths that exist, --set keys the config layer accepts."""
    import os
    import re
    import xml.etree.ElementTree as ET

    from isdf_tpu.utils.config import apply_overrides

    pkg = os.path.join(os.path.dirname(__file__), "..", "isdf_tpu")
    launches = glob.glob(os.path.join(pkg, "launch", "*.launch"))
    assert len(launches) == 2
    for lf in launches:
        root = ET.parse(lf).getroot()
        assert root.tag == "launch"
        for node in root.iter("node"):
            assert node.get("pkg") == "isdf_tpu"
            script = os.path.join(pkg, "train", node.get("type"))
            assert os.path.isfile(script), script
            args = node.get("args", "")
            for cfg_rel in re.findall(r"\$\(find isdf_tpu\)/(\S+\.json)",
                                      args):
                assert os.path.isfile(os.path.join(pkg, cfg_rel)), cfg_rel
            sets = re.findall(r"--set\s+(\S+=\S+)", args)
            apply_overrides({}, sets)  # must parse cleanly
