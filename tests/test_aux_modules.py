import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.data import sdf_util as SU
from isdf_tpu.eval import metrics as MET


def test_chomp_cost_branches():
    sdf = np.array([-0.5, 0.5, 3.0])
    c = MET.chomp_cost(sdf, epsilon=2.0)
    assert np.isclose(c[0], 0.5 + 1.0)            # inside: -sdf + eps/2
    assert np.isclose(c[1], (0.5 - 2.0) ** 2 / 4)  # quadratic zone
    assert c[2] == 0.0                             # beyond eps


def test_binned_losses_matches_manual():
    gt = np.array([-0.5, 0.05, 0.15, 0.3, 0.7, 2.0])
    diff = np.arange(6, dtype=float)
    bins = MET.binned_losses(diff, gt)
    assert len(bins) == 6
    assert np.isclose(bins[0], 0.0)   # gt < 0 bin has diff 0
    assert np.isclose(bins[1], 1.0)
    assert np.isclose(bins[5], 5.0)


def test_accuracy_completion():
    g = np.arange(0, 5, 0.5)
    gx, gy = np.meshgrid(g, g)
    gt = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    assert MET.accuracy(gt, gt) == 0.0
    shifted = gt + np.array([0.1, 0, 0])  # shift < half grid spacing
    assert np.isclose(MET.accuracy(gt, shifted), 0.1, atol=1e-6)
    assert np.isclose(MET.completion(gt, shifted), 0.1, atol=1e-6)
    assert MET.completion_ratio(gt, shifted, dist_th=0.2) == 1.0


def test_sdf_interpolator_roundtrip():
    grid = np.random.default_rng(1).normal(size=(8, 9, 10)).astype(np.float32)
    T = np.eye(4, dtype=np.float32) * 0.5
    T[3, 3] = 1
    T[:3, 3] = [1.0, 2.0, 3.0]
    interp = SU.sdf_interpolator(grid, T)
    # exact grid nodes reproduce values
    pts = np.array([[1.0, 2.0, 3.0], [1.5, 2.5, 3.5]])
    vals = interp(pts)
    assert np.isclose(vals[0], grid[0, 0, 0], atol=1e-6)
    assert np.isclose(vals[1], grid[1, 1, 1], atol=1e-6)
    # OOB modes
    oob = np.array([[100.0, 0, 0]])
    v, m = SU.eval_sdf_interp(interp, oob, handle_oob="mask")
    assert not m[0]
    v = SU.eval_sdf_interp(interp, oob, handle_oob="fill", oob_val=7.0)
    assert v[0] == 7.0


def test_trilinear_jax_matches_scipy():
    grid = np.random.default_rng(2).normal(size=(6, 6, 6)).astype(np.float32)
    T = np.eye(4, dtype=np.float32) * 0.3
    T[3, 3] = 1
    interp_s = SU.sdf_interpolator(grid, T)
    interp_j = SU.trilinear_interp_jax(grid, T)
    pts = np.random.default_rng(3).uniform(0.01, 1.4, (50, 3)).astype(
        np.float32)
    a = interp_s(pts)
    b = np.asarray(interp_j(jnp.asarray(pts)))
    assert np.allclose(a, b, atol=1e-4)


def test_mesh_to_sdf_sphere_sign():
    from isdf_tpu.utils import mesh3d
    # sphere mesh -> back to SDF, check sign inside/outside
    ax = np.linspace(-1.5, 1.5, 40).astype(np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    s = np.sqrt(gx**2 + gy**2 + gz**2) - 1.0
    v, f = mesh3d.marching_tetrahedra(s, 0.0, (3/39.,)*3, (-1.5,)*3)
    T = np.eye(4, dtype=np.float32) * (3 / 39.0)
    T[3, 3] = 1
    T[:3, 3] = -1.5
    sdf = SU.mesh_to_sdf(v, f, (40, 40, 40), T)
    assert sdf[20, 20, 20] < 0           # centre inside
    assert sdf[0, 0, 0] > 0.5            # corner outside
    # magnitude approx correct at corner: |(−1.5,−1.5,−1.5)|−1 ≈ 1.6
    assert abs(sdf[0, 0, 0] - 1.6) < 0.25


def test_exp_so3_exp_se3():
    from isdf_tpu.ops.geometry import exp_so3, exp_se3
    # 90 deg about z
    w = jnp.asarray([[0.0, 0.0, np.pi / 2], [0.0, 0.0, 0.0]])
    R = np.asarray(exp_so3(w))
    assert np.allclose(R[0], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    assert np.allclose(R[1], np.eye(3), atol=1e-7)
    # gradient safe at zero
    g = jax.grad(lambda ww: exp_so3(ww)[0, 1].sum())(jnp.zeros((1, 3)))
    assert np.isfinite(np.asarray(g)).all()
    T = np.asarray(exp_se3(jnp.asarray([[0, 0, 0, 1.0, 2.0, 3.0]])))
    assert np.allclose(T[0, :3, 3], [1, 2, 3])


def test_latest_frame_queue():
    from isdf_tpu.data.live import LatestFrameQueue
    q = LatestFrameQueue()
    for i in range(5):
        q.put_latest(i)
    assert q.get_latest(timeout=1.0) == 4


def test_batch_config_generators(tmp_path):
    from isdf_tpu.train import batch as B
    base = {"dataset": {"format": "synthetic"}, "model": {"window_size": 5}}
    jobs = B.nruns_per_seq(base, ["/data/seqs/apt_2_nav/"], n_runs=3)
    assert len(jobs) == 3
    assert jobs[0][1] == "apt_2_nav_0" and jobs[2][1] == "apt_2_nav_2"
    assert jobs[1][0]["seed"] == 1

    jobs = B.vary_param(base, "model.window_size", [3, 7],
                        ["/data/seqs/apt_2_nav/"])
    assert len(jobs) == 2
    assert jobs[0][0]["model"]["window_size"] == 3
    assert jobs[1][1].startswith("window_size_7")


def test_figs_aggregation(tmp_path):
    from isdf_tpu.eval import figs as F
    # synthesise two runs of one sequence in vox_res.json schema
    for i, offset in enumerate([0.0, 0.02]):
        d = tmp_path / f"apt_2_nav_{i}"
        d.mkdir()
        payload = {}
        for t in [1.0, 2.0, 3.0]:
            payload[str(t)] = {
                "time": t,
                "rays": {"vis": {"av_l1": 0.1 / t + offset}},
            }
        with open(d / "vox_res.json", "w") as f:
            json.dump(payload, f)
    groups = F.runs_by_sequence(str(tmp_path))
    assert list(groups) == ["apt_2_nav"] and len(groups["apt_2_nav"]) == 2
    t, m, s = F.mean_std_curve(groups["apt_2_nav"])
    assert m[0] > m[-1]
    assert np.allclose(s, 0.01, atol=1e-6)
    mean, std = F.final_values(groups["apt_2_nav"])
    assert np.isclose(mean, 0.1 / 3 + 0.01, atol=1e-6)
    out = F.plot_all_seq(str(tmp_path), str(tmp_path / "fig.png"))
    assert os.path.exists(out)


def test_fixed_pts_eval_schema():
    from isdf_tpu.eval.eval_pts import fixed_pts_eval
    from isdf_tpu.ops import geometry as G
    H, W = 16, 24
    depth = np.full((2, H, W), 2.0, np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    dirs = np.asarray(G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2))

    def gt(p):
        return 2.0 - np.asarray(p)[..., 2]   # wall at z=2

    res = fixed_pts_eval(lambda p: gt(p), 1.0, None, depth, T, dirs, gt,
                         grad_fn=lambda p: np.tile([0, 0, -1.0],
                                                   (len(p), 1)))
    assert res["time"] == 1.0
    assert res["rays"]["vis"]["av_l1"] < 1e-5      # sdf_fn == gt
    assert len(res["rays"]["vis"]["binned_l1"]) == 6
    assert "av_cossim" in res["rays"]["vis"]
    assert res["rays"]["vis"]["av_cossim"][0] < 1e-5
    assert "visible_surf" in res


def _write_voxblox_fixture(root, seq, vsm=0.1):
    """Synthetic voxblox-format results dir: res.json (nn/vox/fill
    regions) + scattered out/{t}.npy sdf samples + params.json."""
    import json
    d = os.path.join(root, seq)
    os.makedirs(os.path.join(d, "out"), exist_ok=True)
    entry = lambda v: {
        "time": v,
        "rays": {
            "nn": {"av_l1": 0.05 / v, "l1_chomp_costs": [0.1], "av_cossim": [0.3, 0.3]},
            "vox": {"av_l1": 0.04 / v, "l1_chomp_costs": [0.2], "av_cossim": [0.2, 0.2], "prop_vox": 0.8},
            "fill": {"av_l1": 0.06 / v, "l1_chomp_costs": [0.3], "av_cossim": [0.4, 0.4]},
        }}
    res = {"sdf_eval": {"1": entry(1.0), "2": entry(2.0),
                        "bins_lb": [0], "bins_ub": [1]}}
    with open(os.path.join(d, "res.json"), "w") as f:
        json.dump(res, f)
    with open(os.path.join(d, "params.json"), "w") as f:
        json.dump({"voxel_size": vsm}, f)
    # scattered samples of sdf(x,y,z) = x at voxel CENTERS (voxblox
    # sample convention: offset by vsm/2, like the reference grid)
    g = np.arange(-0.45, 0.5, vsm)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    rows = np.concatenate([pts, pts[:, :1]], axis=1)
    np.savetxt(os.path.join(d, "out", "2.npy"), rows)
    return d


def _write_gpuf_fixture(root, seq):
    """KinectFusion+-format dir: vox_res.json + dense txt grid."""
    import json
    d = os.path.join(root, seq)
    os.makedirs(d, exist_ok=True)
    entry = lambda v: {
        "time": v,
        "rays": {
            "vis": {"av_l1": 0.03 * v, "l1_chomp_costs": [0.1], "av_cossim": [0.3, 0.3]},
            "vox": {"av_l1": 0.02 * v, "l1_chomp_costs": [0.2], "av_cossim": [0.2, 0.2]},
        }}
    with open(os.path.join(d, "vox_res.json"), "w") as f:
        json.dump({"1": entry(1.0), "2": entry(2.0)}, f)
    dims, vsm = (4, 5, 6), 0.25
    sdf = np.arange(np.prod(dims), dtype=np.float64).reshape(dims)
    with open(os.path.join(d, "transform.txt"), "w") as f:
        f.write(f"dims {dims[0]} {dims[1]} {dims[2]}\n")
        f.write(f"vsm {vsm} {vsm} {vsm}\n")
        f.write("offset 1.0 2.0 3.0\n")
    np.savetxt(os.path.join(d, "final_sdf.txt"), sdf.reshape(-1))
    return d, sdf, vsm


def test_baseline_loaders(tmp_path):
    """Voxblox / KinectFusion+ result + grid loaders (VERDICT r1 item 5;
    reference plot_utils.py:107-192, all_seq.py:289-428)."""
    from isdf_tpu.eval import baselines as BL

    _write_voxblox_fixture(str(tmp_path / "vox"), "apt_2_nav")
    c = BL.load_voxblox_res(str(tmp_path / "vox"), "apt_2_nav")
    assert np.allclose(c["times"], [1.0, 2.0])
    assert np.allclose(c["sdf_vis"], [0.05, 0.025])   # nn region
    assert np.allclose(c["chomp_vis"], [0.3, 0.3])    # fill region
    assert np.allclose(c["prop_vox"], [0.8, 0.8])

    d, sdf, vsm = _write_gpuf_fixture(str(tmp_path / "gpuf"), "apt_2_nav")
    c2 = BL.load_gpu_fusion_res(str(tmp_path / "gpuf"), "apt_2_nav")
    assert np.allclose(c2["sdf_vis"], [0.03, 0.06])

    interp = BL.gpuf_sdf_interp(d)
    # world point of voxel (1,2,3): offset + vsm*idx
    p = np.array([[1.0 + 0.25, 2.0 + 0.5, 3.0 + 0.75]])
    assert np.isclose(float(interp(p)), sdf[1, 2, 3])

    vb = BL.voxblox_sdf_interp(
        os.path.join(str(tmp_path / "vox"), "apt_2_nav"),
        [-0.5, -0.5, -0.5], [0.5, 0.5, 0.5])
    # sdf(x,y,z) = x at mapped cells; query a point snapped on the grid
    q = vb(np.array([[0.25, 0.15, -0.05]]))
    assert np.isfinite(q).all() and abs(float(q[0]) - 0.25) < 0.11
    # far outside the mapped region -> NaN hole
    assert np.isnan(float(vb(np.array([[2.4, 2.4, 2.4]]))[0]))


def test_plot_all_seq_with_grid_baselines(tmp_path):
    """One figure overlaying isdf_tpu runs + voxblox + KinectFusion+
    (VERDICT r1 item 5 'done' criterion)."""
    import json

    from isdf_tpu.eval import figs as F

    # two isdf_tpu-format runs
    for i in range(2):
        d = tmp_path / "ours" / f"apt_2_nav_{i}"
        d.mkdir(parents=True)
        entries = {}
        for t in (1.0, 2.0):
            entries[str(t)] = {
                "time": t,
                "rays": {"vis": {"av_l1": 0.1 / t + 0.01 * i},
                         "vox": {"av_l1": 0.1 / t}}}
        with open(d / "vox_res.json", "w") as f:
            json.dump(entries, f)
    _write_voxblox_fixture(str(tmp_path / "vox"), "apt_2_nav")
    _write_gpuf_fixture(str(tmp_path / "gpuf"), "apt_2_nav")

    out = F.plot_all_seq(str(tmp_path / "ours"),
                         str(tmp_path / "fig.png"),
                         voxblox_root=str(tmp_path / "vox"),
                         gpuf_root=str(tmp_path / "gpuf"))
    assert os.path.exists(out)


def test_plot_per_seq_dashboard(tmp_path):
    """plot_per_seq renders the reference per_seq dashboard content
    (VERDICT r2 item 8): average+surface L1, binned panel, cossim panel
    (vis+vox), keyframe timeline with thumbnails — from the fixed
    vox_res.json schema AND the flat online res.json schema."""
    import json

    from isdf_tpu.eval import figs as F

    # fixed-protocol artifact: full vis/vox nesting + cossim + surf
    d = tmp_path / "run_vox"
    d.mkdir()
    payload = {}
    for t in (1.0, 2.0, 3.0):
        reg = lambda s: {"av_l1": s / t, "binned_l1": [s / t] * 6,
                         "l1_chomp_costs": [s / t] * 3,
                         "av_cossim": [0.3 / t, 0.3 / t]}
        payload[str(t)] = {"time": t,
                           "rays": {"vis": reg(0.1), "vox": reg(0.2)},
                           "visible_surf": {"vis": reg(0.05),
                                            "vox": reg(0.06)},
                           "vol": {"vis": reg(0.4), "vox": reg(0.4)}}
    with open(d / "vox_res.json", "w") as f:
        json.dump(payload, f)
    with open(d / "res.json", "w") as f:  # kf ids live in res.json
        json.dump({"sdf_eval": {}, "kf_indices": [0, 30, 60]}, f)

    class ThumbDS:
        def __getitem__(self, i):
            return {"depth": np.full((6, 8), 1.0 + i, np.float32)}

    # merge kf ids into the vox payload like a campaign run dir
    payload["kf_indices"] = [0, 30, 60]
    with open(d / "vox_res.json", "w") as f:
        json.dump(payload, f)
    out = F.plot_per_seq(str(d), str(tmp_path / "dash.png"),
                         dataset=ThumbDS())
    assert os.path.exists(out)

    # flat online schema (the campaign res.json shape)
    d2 = tmp_path / "run_flat"
    d2.mkdir()
    flat = {"sdf_eval": {}, "kf_indices": [0, 25]}
    for t in (1.0, 2.0):
        flat["sdf_eval"][str(int(t * 250))] = {
            "time": t, "rays": {"av_l1": 0.1 / t, "binned_l1": [0.1] * 6,
                                "l1_chomp_costs": [0.1] * 3}}
    with open(d2 / "res.json", "w") as f:
        json.dump(flat, f)
    out2 = F.plot_per_seq(str(d2), str(tmp_path / "dash2.png"),
                          fname="res.json")
    assert os.path.exists(out2)


def test_slice_comparison_with_baselines_one_call(tmp_path):
    """slice_comparison_with_baselines loads the voxblox/KF+ grids from
    their own artifact formats and renders all methods on the trainer's
    planes in one call (VERDICT r2 item 8 'done' criterion)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.figs import slice_comparison_with_baselines
    from isdf_tpu.utils.config import Config

    _write_voxblox_fixture(str(tmp_path / "vox"), "apt_2_nav")
    _write_gpuf_fixture(str(tmp_path / "gpuf"), "apt_2_nav")

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    tr = Trainer(cfg, dataset=ds, grid_dim=48, seed=0)

    out = slice_comparison_with_baselines(
        tr, str(tmp_path / "cmp3.png"), "apt_2_nav",
        voxblox_root=str(tmp_path / "vox"),
        gpuf_root=str(tmp_path / "gpuf"), n_slices=2)
    assert os.path.exists(out)
    import cv2
    im = cv2.imread(out)
    assert im.shape[0] >= 3 * 48 - 3   # three method rows


def test_slice_comparison_with_grid_baseline(tmp_path):
    """slice_comparison renders callable (grid-baseline) methods on the
    trainer's slice planes (reference eval/figs/slices.py)."""
    from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.figs import slice_comparison
    from isdf_tpu.utils.config import Config

    cfg = Config().replace(
        dataset_format="synthetic", n_rays=16, n_strat_samples=5,
        n_surf_samples=2, hidden_feature_size=32, hidden_layers_block=1,
        n_embed_funcs=3, kf_buffer_size=4)
    ds = SyntheticDataset(SyntheticScene(), n_frames=4, H=24, W=32)
    tr = Trainer(cfg, dataset=ds, grid_dim=48, seed=0)

    baseline = lambda pts: np.asarray(pts)[:, 0]  # analytic "grid"
    out = slice_comparison([tr, baseline], str(tmp_path / "cmp.png"),
                           n_slices=2)
    assert os.path.exists(out)
    import cv2
    im = cv2.imread(out)
    assert im.shape[0] >= 2 * 48 - 2   # two method rows


def test_fixed_pts_eval_vox_cossim_nested_subset(tmp_path):
    """The vox-region gradient cossim is computed on the reference's
    NESTED vox subset (isdf/eval/eval_pts.py:148-191: grad-valid mask
    chained through [vis_valid_gt_sdf][vis_valid_vox_sdf]), not copied
    from the vis value — when the predicted gradient errs only on the
    vox subset the two numbers must differ."""
    from isdf_tpu.eval.eval_pts import _torch_sample_rays, fixed_pts_eval
    from isdf_tpu.ops import geometry as G
    H, W = 16, 24
    depth = np.full((2, H, W), 2.0, np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    dirs = np.asarray(G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2))

    def gt(p):
        return 2.0 - np.asarray(p)[..., 2]

    def gt_grad(p):
        g = np.zeros((len(p), 3), np.float32)
        g[:, 2] = -1.0
        return g

    pts = _torch_sample_rays("1.000", depth, T, dirs, 0.1, False)
    xmed = float(np.median(pts[:, 0]))
    mdir = tmp_path / "eval_pts" / "1.000"
    mdir.mkdir(parents=True)
    vis_keep = np.ones(len(pts), bool)
    vox_split = pts[:, 0] > xmed   # the half-space the predictor gets wrong
    np.save(mdir / "vis_valid_gt_sdf.npy", vis_keep)
    np.save(mdir / "vis_valid_vox_sdf.npy", vox_split)
    np.save(mdir / "vis_valid_gt_grad.npy", vis_keep)
    np.save(mdir / "vis_valid_vox_grad.npy", vox_split)
    n_surf = len(_torch_sample_rays("1.000", depth, T, dirs, 0.0, True))
    np.save(mdir / "surf_valid_gt_sdf.npy", np.ones(n_surf, bool))
    np.save(mdir / "surf_valid_vox_sdf.npy", np.ones(n_surf, bool))

    def pred_grad(p):
        g = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (len(p), 1))
        g[np.asarray(p)[:, 0] > xmed] = [1.0, 0.0, 0.0]  # orthogonal
        return g

    res = fixed_pts_eval(
        lambda p: gt(p), 1.0, str(tmp_path / "eval_pts"), depth, T, dirs,
        gt, dataset_format="replicaCAD", grad_fn=pred_grad,
        gt_grad_fn=gt_grad)
    vis_c = res["rays"]["vis"]["av_cossim"][0]
    vox_c = res["rays"]["vox"]["av_cossim"][0]
    # vox subset: every gradient orthogonal -> cosdist exactly 1;
    # vis: mixture of perfect and orthogonal -> strictly smaller
    assert abs(vox_c - 1.0) < 1e-5
    assert vox_c > vis_c + 0.2


def test_fixed_pts_eval_prebaked_vol_and_masks(tmp_path):
    """Full-volume points come from eval_pts_root/full_vol files and the
    per-timestamp mask dirs gate the ray regions (VERDICT r1 item 4;
    reference isdf/eval/eval_pts.py:115-124, 260-297)."""
    from isdf_tpu.eval.eval_pts import _torch_sample_rays, fixed_pts_eval
    from isdf_tpu.ops import geometry as G
    H, W = 16, 24
    depth = np.full((2, H, W), 2.0, np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    dirs = np.asarray(G.ray_dirs_C(H, W, 20.0, 20.0, W / 2, H / 2))

    def gt(p):
        return 2.0 - np.asarray(p)[..., 2]

    # pre-baked volume points with DELIBERATELY offset gt values: the vol
    # result must reflect the file, not gt_sdf_fn
    root = tmp_path / "eval_pts_root"
    (root / "full_vol").mkdir(parents=True)
    rng = np.random.default_rng(0)
    vol_pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    vol_gt = gt(vol_pts) + 0.25
    np.save(root / "full_vol" / "replicaCAD.npy", vol_pts)
    np.save(root / "full_vol" / "gt_apt_test.npy", vol_gt)

    # per-timestamp mask dir sized to the deterministic samplers
    t = 1.0
    n_vis = len(_torch_sample_rays("1.000", depth, T, dirs, 0.1, False))
    n_surf = len(_torch_sample_rays("1.000", depth, T, dirs, 0.0, True))
    mdir = root / "eval_pts" / "1.000"
    mdir.mkdir(parents=True)
    vis_keep = rng.random(n_vis) > 0.3
    vox_split = rng.random(int(vis_keep.sum())) > 0.5
    np.save(mdir / "vis_valid_gt_sdf.npy", vis_keep)
    np.save(mdir / "vis_valid_vox_sdf.npy", vox_split)
    np.save(mdir / "vis_valid_gt_grad.npy", vis_keep)
    np.save(mdir / "vis_valid_vox_grad.npy", vox_split)
    surf_keep = rng.random(n_surf) > 0.3
    np.save(mdir / "surf_valid_gt_sdf.npy", surf_keep)
    np.save(mdir / "surf_valid_vox_sdf.npy",
            rng.random(int(surf_keep.sum())) > 0.5)

    res = fixed_pts_eval(
        lambda p: gt(p), t, str(root / "eval_pts"), depth, T, dirs, gt,
        dataset_format="replicaCAD",
        eval_pts_root=str(root), seq_dir="seqs/apt_test")
    # masked regions: both splits populated and perfect (sdf_fn == gt)
    assert res["rays"]["vis"]["av_l1"] < 1e-5
    assert res["rays"]["vox"]["av_l1"] < 1e-5
    assert res["visible_surf"]["vox"]["av_l1"] < 1e-5
    # vol region scored against the FILE's gt -> exactly the 0.25 offset
    assert abs(res["vol"]["av_l1"] - 0.25) < 1e-6
    assert len(res["vol"]["binned_l1"]) == 6
    assert len(res["vol"]["l1_chomp_costs"]) == 3


def test_pose_refine_holds_still_on_untrained_map():
    """The LM tracker's terra-incognita guard: an UNtrained map has no
    eikonal-consistent gradients (|grad| far from 1) anywhere, so all
    samples are gated out of the normal equations and the pose must stay
    PUT — moving against garbage is the failure mode the gate exists
    for. (Convergence on a real map: tests/test_engine.py
    test_pose_refinement_reduces_pose_error_in_trainer.)"""
    from isdf_tpu.engine.pose import (build_pose_refine_step,
                                      corrected_poses, init_pose_state)
    from isdf_tpu.models import sdf_mlp as M
    from isdf_tpu.ops import geometry as G

    model = M.SDFModel(embedding_size=2 * 21 * 4 + 3, hidden_size=32,
                       hidden_layers_block=1, max_deg=3, scale_input=0.06)
    params = M.init_params(jax.random.PRNGKey(0), model)

    state, opt = init_pose_state(4, pose_lr=1e-3)
    step = build_pose_refine_step(model, opt, n_rays=32, n_surf_samples=4)
    H, W = 12, 16
    depth = jnp.full((1, H, W), 2.0)
    T = jnp.eye(4)[None]
    dirs = G.ray_dirs_C(H, W, 15.0, 15.0, W / 2, H / 2)
    state2, losses = step(params, state, depth, T, jnp.asarray([0]),
                          dirs, jnp.eye(4), jax.random.PRNGKey(1),
                          n_steps=5)
    assert np.isfinite(np.asarray(losses)).all()
    # untouched rows stay zero; the refined row holds still too (or at
    # most a clamped, accepted real-improvement step)
    assert float(jnp.abs(state2.twists[1:]).sum()) == 0
    assert float(jnp.abs(state2.twists[0]).max()) <= 0.06
    Tc = corrected_poses(state2.twists[:1], T[0])
    assert np.isfinite(np.asarray(Tc)).all()


@pytest.mark.skipif(not os.path.isdir("/root/reference/results/iSDF/exp0"),
                    reason="reference artifacts not mounted")
def test_figs_reads_reference_exp0_artifacts():
    """Our aggregation tooling consumes the reference's shipped result
    artifacts unchanged (the integration contract, SURVEY.md section 4d)."""
    from isdf_tpu.eval import figs as F
    groups = F.runs_by_sequence("/root/reference/results/iSDF/exp0")
    assert "apt_2_nav" in groups and len(groups["apt_2_nav"]) >= 5
    t, m, s = F.mean_std_curve(groups["apt_2_nav"],
                               metric=("rays", "vis", "av_l1"))
    assert len(t) > 10
    assert m[-1] < m[0]          # error decreases over the sequence
    mean, std = F.final_values(groups["apt_2_nav"],
                               metric=("rays", "vis", "av_l1"))
    # BASELINE.md: 4.47 cm +/- 0.49 over 10 seeds
    assert abs(mean - 0.0447) < 0.01
    assert 0.001 < std < 0.02


def test_run_jobs_retries_transient_failures(tmp_path, monkeypatch):
    """A job that dies on a transient error is retried from scratch and
    stale artifacts from the failed attempt are cleared (the
    round4_campaign room_c_1 lesson)."""
    import isdf_tpu.train.batch as batch

    calls = {"n": 0}

    def flaky(config, save_path, max_steps=None, seed=None, grid_dim=200):
        import json as _json
        import os as _os
        calls["n"] += 1
        _os.makedirs(save_path, exist_ok=True)
        if calls["n"] == 1:
            # partial artifact then die (mid-run infra failure)
            with open(_os.path.join(save_path, "res.json"), "w") as f:
                _json.dump({"sdf_eval": {"1": {"stale": True}}}, f)
            raise RuntimeError("remote_compile: connection dropped")
        with open(_os.path.join(save_path, "res.json"), "w") as f:
            _json.dump({"sdf_eval": {"1": {"ok": True}}}, f)
        return "ok"

    real_run = batch.run

    def wrapped(config, save_path, **kw):
        # exercise the real artifact-clearing preamble, then the fake
        for fname in ("res.json", "vox_res.json"):
            p = os.path.join(save_path, fname)
            if os.path.exists(p):
                os.remove(p)
        return flaky(config, save_path, **kw)

    monkeypatch.setattr(batch, "run", wrapped)
    out = batch.run_jobs([({"seed": 0}, "job_a")], str(tmp_path),
                         retries=1)
    assert out["job_a"] == "ok"
    assert calls["n"] == 2
    import json as _json
    r = _json.load(open(tmp_path / "job_a" / "res.json"))
    assert r["sdf_eval"]["1"] == {"ok": True}
    batch.run = real_run
