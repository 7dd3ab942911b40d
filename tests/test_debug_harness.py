"""Ray-oracle debug harness (eval/debug.py) — the working version of the
reference's commented-out Trainer.check_gt_sdf (trainer.py:870-949)."""

import os

import numpy as np

from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
from isdf_tpu.engine.trainer import Trainer
from isdf_tpu.eval.debug import ray_oracle, ray_oracle_figure
from isdf_tpu.utils.config import Config


def _trainer():
    cfg = Config().replace(
        dataset_format="synthetic",
        n_rays=50, n_strat_samples=9, n_surf_samples=4,
        hidden_feature_size=64, hidden_layers_block=1, n_embed_funcs=4,
        kf_buffer_size=8, bounds_method="pc", do_eval=False,
        max_depth=12.0)
    scene = SyntheticScene(extents=(5.0, 3.0, 4.0))
    ds = SyntheticDataset(scene, n_frames=20, H=48, W=64)
    tr = Trainer(cfg, dataset=ds, seed=0)
    tr.last_is_keyframe = True
    tr.add_frame(tr.get_data([0])[0])
    return tr


def test_ray_oracle_targets_track_gt():
    tr = _trainer()
    rays = ray_oracle(tr, n_rays=3, seed=0)
    assert len(rays) == 3
    for ray in rays:
        z = ray["z"]
        assert np.all(np.diff(z) >= 0) and np.isfinite(z).all()
        for k in ("gt", "ray", "normal", "pc", "pred"):
            assert ray[k].shape == z.shape

        # bound property (loss.py:13-22 / the paper's eq. 8): in free
        # space the distance to the ray's hit point upper-bounds the true
        # SDF (gt <= b_ray); behind the surface the inequality flips
        m = np.isfinite(ray["gt"])
        assert m.sum() >= z.size - 2
        free = m & (ray["ray"] > 0)
        behind = m & (ray["ray"] < 0)
        assert np.all(ray["gt"][free] <= ray["ray"][free] + 1e-4)
        assert np.all(ray["gt"][behind] >= ray["ray"][behind] - 1e-4)
        # batch-distance bound is the distance to the nearest batch
        # surface point — a TIGHTER free-space estimate than the ray bound
        if free.any():
            assert np.all(ray["pc"][free] <= ray["ray"][free] + 1e-4)
        # the exact-surface sample (z == depth) has gt ~ 0
        i0 = np.argmin(np.abs(ray["ray"]))
        assert abs(ray["gt"][i0]) < 0.05


def test_ray_oracle_figure_writes_png(tmp_path):
    tr = _trainer()
    out = str(tmp_path / "ray_oracle.png")
    ray_oracle_figure(tr, out, n_rays=2, seed=1)
    assert os.path.isfile(out) and os.path.getsize(out) > 5000


def test_vis_embedding_writes_png(tmp_path):
    import jax

    from isdf_tpu.eval.debug import vis_embedding
    from isdf_tpu.ops.embedding import init_gaussian_embedding

    out = str(tmp_path / "pe.png")
    vis_embedding(out, scale=0.5)
    assert os.path.getsize(out) > 3000
    # gaussian-band branch (the part that is broken in the reference)
    B = init_gaussian_embedding(jax.random.PRNGKey(0), n_feats=16)
    out2 = str(tmp_path / "rff.png")
    vis_embedding(out2, B=np.asarray(B))
    assert os.path.getsize(out2) > 3000
