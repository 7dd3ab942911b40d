"""Golden-value tests driving the PyTorch REFERENCE implementation as a
numerical oracle (VERDICT r2 "what's missing" item 1a).

Each test feeds IDENTICAL inputs to a reference op
(isdf/modules/{loss.py:92-205, sample.py:131-178, embedding.py:96-110,
fc_map.py:63-111, render.py:12-35}) and to our JAX op, and asserts
agreement to float32 tolerance.  This replaces re-derivation trust with
executed equivalence.  The reference is loaded read-only via
tests/ref_oracle.py (stub-import shim); torch runs on CPU.

Where our masked-static semantics deliberately diverge (invalid rays
masked not filtered; frame_avg duplicate pixels summed not last-write —
see docs/ROADMAP.md "Known divergences"), the test constructs inputs on
which the semantics coincide (all rays valid, unique pixels) so the MATH
is still compared exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference/isdf"):
    pytest.skip("reference tree not present", allow_module_level=True)

from tests.ref_oracle import load_reference  # noqa: E402

REF = load_reference()

RNG = np.random.default_rng(7)


def _rand_rays(R=64, S=9):
    """Shared random ray batch: depth, z_vals (ascending, surface sample
    at index 0 like sample_along_rays), camera dirs, poses, normals."""
    depth = RNG.uniform(0.5, 4.0, R).astype(np.float32)
    strat = np.sort(RNG.uniform(0.2, 4.5, (R, S - 1)), axis=1)
    z = np.concatenate([depth[:, None], strat], axis=1).astype(np.float32)
    dirs_C = RNG.normal(size=(R, 3)).astype(np.float32)
    dirs_C[:, 2] = np.abs(dirs_C[:, 2]) + 0.5
    dirs_C /= np.abs(dirs_C[:, 2:])          # z-depth convention
    normals = RNG.normal(size=(R, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    T = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    aa = RNG.normal(size=3) * 0.3
    from scipy.spatial.transform import Rotation
    T[:, :3, :3] = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    T[:, :3, 3] = RNG.normal(size=(R, 3)).astype(np.float32)
    return depth, z, dirs_C, T, normals


def test_golden_origin_dirs_W():
    """ops/geometry.py origin_dirs_W vs reference transform.py:36-41."""
    depth, z, dirs_C, T, _ = _rand_rays()
    ro, rd = REF.transform.origin_dirs_W(
        torch.from_numpy(T), torch.from_numpy(dirs_C))
    from isdf_tpu.ops.geometry import origin_dirs_W
    oo, od = origin_dirs_W(jnp.asarray(T), jnp.asarray(dirs_C))
    np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(od), rd.numpy(), atol=1e-6)


def test_golden_bounds_ray():
    """ops/bounds.py bounds_ray vs reference loss.py:13-22,48-53."""
    depth, z, dirs_C, T, _ = _rand_rays()
    rb, rg = REF.loss.bounds_ray(
        torch.from_numpy(depth), torch.from_numpy(z),
        torch.from_numpy(dirs_C), torch.from_numpy(T), True)
    from isdf_tpu.ops.bounds import bounds_ray
    from isdf_tpu.ops.geometry import origin_dirs_W
    _, dirs_W = origin_dirs_W(jnp.asarray(T), jnp.asarray(dirs_C))
    ours = bounds_ray(jnp.asarray(depth), jnp.asarray(z),
                      jnp.asarray(dirs_C), dirs_W)
    np.testing.assert_allclose(np.asarray(ours.bounds), rb.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.grad), rg.numpy(), atol=1e-5)


def test_golden_bounds_normal():
    """ops/bounds.py bounds_normal vs reference loss.py:25-45.

    NOTE the reference's bounds_normal is BROKEN AS SHIPPED: loss.py:30
    calls bounds_ray(depth, z, dirs) but the signature (loss.py:13) takes
    5 required args -> TypeError on any call (the shipped configs all use
    ray/pc so the path never runs).  The oracle here patches that one
    internal call to what the call site self-evidently intends (the bare
    bounds tensor); everything downstream is the reference's own code."""
    depth, z, dirs_C, T, normals = _rand_rays()
    trunc = 0.3
    orig = REF.loss.bounds_ray
    REF.loss.bounds_ray = lambda d, zz, dc: orig(d, zz, dc, None, False)[0]
    try:
        rb, rg = REF.loss.bounds_normal(
            torch.from_numpy(depth), torch.from_numpy(z),
            torch.from_numpy(dirs_C), torch.from_numpy(normals),
            trunc, torch.from_numpy(T), True)
    finally:
        REF.loss.bounds_ray = orig
    from isdf_tpu.ops.bounds import bounds_normal
    from isdf_tpu.ops.geometry import origin_dirs_W
    _, dirs_W = origin_dirs_W(jnp.asarray(T), jnp.asarray(dirs_C))
    ours = bounds_normal(jnp.asarray(depth), jnp.asarray(z),
                         jnp.asarray(dirs_C), jnp.asarray(normals),
                         trunc, dirs_W)
    np.testing.assert_allclose(np.asarray(ours.bounds), rb.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.grad), rg.numpy(), atol=1e-5)


def test_golden_bounds_pc():
    """ops/bounds.py bounds_pc (MXU matmul-argmin form) vs the reference's
    full [R,S,R] pairwise tensor (loss.py:56-89)."""
    depth, z, dirs_C, T, _ = _rand_rays(R=48, S=7)
    from isdf_tpu.ops.geometry import origin_dirs_W
    o, d = origin_dirs_W(jnp.asarray(T), jnp.asarray(dirs_C))
    pc = np.asarray(o)[:, None, :] + np.asarray(d)[:, None, :] * z[:, :, None]

    rb, rg = REF.loss.bounds_pc(
        torch.from_numpy(pc), torch.from_numpy(z),
        torch.from_numpy(depth), do_grad=True)
    from isdf_tpu.ops.bounds import bounds_pc
    ours = bounds_pc(jnp.asarray(pc), jnp.asarray(z), jnp.asarray(depth),
                     jnp.ones(len(depth), bool))
    np.testing.assert_allclose(np.asarray(ours.bounds), rb.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours.grad), rg.numpy(), atol=1e-4)


def test_golden_sdf_loss_and_tot_loss():
    """ops/losses.py sdf_loss + tot_loss vs reference loss.py:122-205,
    including the logging-scalar conventions (sdf/grad logged after/before
    weighting respectively, eikonal after)."""
    R, S = 64, 9
    depth, z, dirs_C, T, normals = _rand_rays(R, S)
    bounds = RNG.normal(size=(R, S)).astype(np.float32) * 0.5
    sdf = RNG.normal(size=(R, S)).astype(np.float32) * 0.4
    eik = np.abs(RNG.normal(size=(R, S)).astype(np.float32))
    gmat = np.abs(RNG.normal(size=(R, S)).astype(np.float32))
    t, tw, gw, ew, ead = 0.29, 5.38, 0.02, 0.27, 0.1

    for loss_type in ("L1", "L2"):
        r_mat, r_free = REF.loss.sdf_loss(
            torch.from_numpy(sdf), torch.from_numpy(bounds), t, loss_type)
        from isdf_tpu.ops.losses import sdf_loss, tot_loss
        o_mat, o_free = sdf_loss(jnp.asarray(sdf), jnp.asarray(bounds), t,
                                 loss_type)
        np.testing.assert_allclose(np.asarray(o_mat), r_mat.numpy(),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(o_free), r_free.numpy())

        # reference tot_loss mutates its inputs — pass copies
        r_tot, r_tot_mat, r_scal = REF.loss.tot_loss(
            r_mat.clone(), torch.from_numpy(gmat.copy()),
            torch.from_numpy(eik.copy()), r_free,
            torch.from_numpy(bounds), ead, tw, gw, ew)
        ours = tot_loss(o_mat, jnp.asarray(gmat), jnp.asarray(eik), o_free,
                        jnp.asarray(bounds), jnp.ones(R, bool),
                        ead, tw, gw, ew)
        np.testing.assert_allclose(np.asarray(ours.mat), r_tot_mat.numpy(),
                                   atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(float(ours.total), float(r_tot),
                                   atol=1e-5, rtol=1e-5)
        for k in ("sdf_loss", "grad_loss", "eikonal_loss", "total_loss"):
            np.testing.assert_allclose(float(ours.scalars[k]),
                                       float(r_scal[k]), atol=1e-5,
                                       rtol=1e-5)


def test_golden_frame_avg():
    """ops/losses.py frame_avg_loss (segment-sum into the block grid) vs
    the reference's scatter-into-image + 8x8 block pool (loss.py:208-240).
    Pixels are sampled WITHOUT replacement so the reference's last-write
    scatter and our sum coincide."""
    F, H, W, factor = 3, 32, 48, 8
    n_rays = 40
    flat = RNG.choice(H * W, size=(F, n_rays), replace=False)
    ib = np.repeat(np.arange(F), n_rays)
    ih, iw = (flat // W).reshape(-1), (flat % W).reshape(-1)
    loss_mat = np.abs(RNG.normal(size=(F * n_rays, 5))).astype(np.float32)
    depth_batch = np.ones((F, H, W), np.float32)

    masks = torch.zeros((F, H, W))
    masks[ib, ih, iw] = 1.0
    r_approx, r_avg = REF.loss.frame_avg(
        torch.from_numpy(loss_mat), torch.from_numpy(depth_batch),
        torch.from_numpy(ib), torch.from_numpy(ih), torch.from_numpy(iw),
        W, H, factor, masks)

    from isdf_tpu.ops.losses import frame_avg_loss
    o_approx, o_avg = frame_avg_loss(
        jnp.asarray(loss_mat.sum(-1)), jnp.ones(F * n_rays, bool),
        jnp.asarray(ib), jnp.asarray(ih), jnp.asarray(iw), F, H, W, factor)
    np.testing.assert_allclose(np.asarray(o_approx), r_approx.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_avg), r_avg.numpy(), atol=1e-5)


def test_golden_positional_encoding():
    """ops/embedding.py positional_encoding vs reference
    PostionalEncoding.forward (embedding.py:96-110), with a non-trivial
    scene transform."""
    from scipy.spatial.transform import Rotation
    Tm = np.eye(4, dtype=np.float32)
    Tm[:3, :3] = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    Tm[:3, 3] = [0.3, -0.2, 0.1]
    scale, max_deg = 0.06, 5

    pts = RNG.uniform(-3, 3, (200, 3)).astype(np.float32)
    ref_pe = REF.embedding.PostionalEncoding(
        min_deg=0, max_deg=max_deg, scale=scale,
        transform=torch.from_numpy(Tm))
    r = ref_pe(torch.from_numpy(pts)).numpy()

    from isdf_tpu.ops.embedding import positional_encoding
    o = np.asarray(positional_encoding(
        jnp.asarray(pts), transform=jnp.asarray(Tm), scale=scale,
        min_deg=0, max_deg=max_deg))
    assert o.shape == r.shape == (200, 2 * 21 * 6 + 3)
    np.testing.assert_allclose(o, r, atol=2e-5)


def _ref_model_and_ours(hidden_layers_block=1, scale=0.06, max_deg=5,
                        scale_output=0.14, transform=None):
    """Build a reference SDFMap and mirror its weights into our pytree."""
    torch.manual_seed(3)
    ref_pe = REF.embedding.PostionalEncoding(
        min_deg=0, max_deg=max_deg, scale=scale,
        transform=None if transform is None else torch.from_numpy(transform))
    ref_map = REF.fc_map.SDFMap(
        ref_pe, hidden_size=256, hidden_layers_block=hidden_layers_block,
        scale_output=scale_output)

    from isdf_tpu.models import sdf_mlp as M
    from isdf_tpu.utils.checkpoint import load_reference_state_dict
    model = M.SDFModel(
        embedding_size=2 * 21 * (max_deg + 1) + 3, hidden_size=256,
        hidden_layers_block=hidden_layers_block, scale_output=scale_output,
        scale_input=scale, min_deg=0, max_deg=max_deg,
        mm_precision="highest")
    params = M.init_params(jax.random.PRNGKey(0), model)
    params = load_reference_state_dict(
        {k: v.detach().numpy() for k, v in ref_map.state_dict().items()},
        params)
    return ref_map, model, params


def test_golden_sdf_map_forward():
    """Our MLP apply with the reference's EXACT weights (state_dict mapped
    via utils/checkpoint.load_reference_state_dict) vs SDFMap.forward
    (fc_map.py:94-111), with scene transform in the PE."""
    Tm = np.eye(4, dtype=np.float32)
    Tm[:3, 3] = [0.5, -0.3, 0.2]
    ref_map, model, params = _ref_model_and_ours(transform=Tm)
    pts = RNG.uniform(-2, 2, (300, 3)).astype(np.float32)
    with torch.no_grad():
        r = ref_map(torch.from_numpy(pts)).numpy()
    from isdf_tpu.models.sdf_mlp import apply
    o = np.asarray(apply(params, jnp.asarray(pts), model,
                         transform=jnp.asarray(Tm)))
    np.testing.assert_allclose(o, r, atol=1e-5)


def test_golden_replica_reader(tmp_path):
    """data/datasets.ReplicaDataset vs the reference's reader + transform
    stack (dataset.py:20-71, image_transforms.py) on the same on-disk
    fixture sequence: identical depth (scaled+filtered), RGB and poses."""
    import cv2

    from isdf_tpu.data.datasets import ReplicaDataset
    from isdf_tpu.utils.config import Config

    H, W, scale, n = 24, 32, 6553.5, 3
    res = tmp_path / "results"
    res.mkdir(parents=True)
    for i in range(n):
        d = (RNG.uniform(0.5, 14.0, (H, W)) * scale).astype(np.uint16)
        d[0, 0] = 0
        cv2.imwrite(str(res / f"depth{i:06d}.png"), d)
        rgb = RNG.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(res / f"frame{i:06d}.png"), rgb)
    Ts = np.tile(np.eye(4), (n, 1, 1))
    Ts[:, :3, 3] = RNG.normal(0, 1, (n, 3))
    np.savetxt(tmp_path / "traj.txt", Ts.reshape(n, 16))

    from tests.ref_oracle import _Compose
    ref_ds = REF.dataset.ReplicaDataset(
        str(res), traj_file=str(tmp_path / "traj.txt"),
        rgb_transform=_Compose([REF.image_transforms.BGRtoRGB()]),
        depth_transform=_Compose(
            [REF.image_transforms.DepthScale(1.0 / scale),
             REF.image_transforms.DepthFilter(12.0)]),
        col_ext=".png")
    ours = ReplicaDataset(str(tmp_path),
                          Config().replace(depth_scale=scale,
                                           max_depth=12.0))
    assert len(ours) == len(ref_ds)
    for i in range(n):
        r, o = ref_ds[i], ours[i]
        np.testing.assert_allclose(np.asarray(o["depth"]), r["depth"],
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(o["image"]), r["image"])
        np.testing.assert_allclose(np.asarray(o["T"]), r["T"], atol=1e-12)


def test_golden_sdf_interp_oob_modes():
    """data/sdf_util sdf_interpolator + eval_sdf_interp vs the
    reference's (sdf_util.py:151-216): same grid axes from the 1cm
    transform convention, same values, same OOB semantics."""
    from isdf_tpu.data import sdf_util as SU

    grid = RNG.normal(0, 1, (9, 7, 11))
    tfm = np.eye(4)
    tfm[0, 0] = tfm[1, 1] = tfm[2, 2] = 0.05
    tfm[:3, 3] = [-0.2, 0.1, -0.3]

    ours_i = SU.sdf_interpolator(grid, tfm)
    ref_i = REF.sdf_util.sdf_interpolator(grid, tfm)

    # interior points: except mode, exact values
    lo = np.array([g[0] for g in ours_i.grid])
    hi = np.array([g[-1] for g in ours_i.grid])
    pin = RNG.uniform(lo, hi, (200, 3))
    np.testing.assert_allclose(SU.eval_sdf_interp(ours_i, pin, "except"),
                               REF.sdf_util.eval_sdf_interp(
                                   ref_i, pin, "except"), atol=1e-12)

    # mixed in/out points: mask + fill modes
    pmix = np.concatenate([pin[:50], pin[:50] + 10.0])
    ov, om = SU.eval_sdf_interp(ours_i, pmix, "mask")
    rv, rm = REF.sdf_util.eval_sdf_interp(ref_i, pmix, "mask")
    np.testing.assert_array_equal(om, rm)
    np.testing.assert_allclose(ov[om], rv[rm], atol=1e-12)
    np.testing.assert_allclose(
        SU.eval_sdf_interp(ours_i, pmix, "fill", oob_val=0.33),
        REF.sdf_util.eval_sdf_interp(ref_i, pmix, "fill", oob_val=0.33),
        atol=1e-12)


def test_golden_save_trajectory_formats(tmp_path):
    """utils/trajectory.save_trajectory vs the reference's
    data_util.save_trajectory (data_util.py:117-141): byte-identical
    replica and realsense_franka files. (TUM needs trimesh quaternions
    in the reference — stubbed out here; our TUM writer has its own
    unit test.)"""
    from isdf_tpu.utils.trajectory import save_trajectory

    F = 4
    traj = np.tile(np.eye(4), (F, 1, 1))
    traj[:, :3, 3] = RNG.normal(0, 1, (F, 3))
    traj[:, :3, :3] += RNG.normal(0, 0.01, (F, 3, 3))
    ts = [0.1 * i for i in range(F)]

    for fmt in ("replica", "realsense_franka"):
        a, b = str(tmp_path / f"ours_{fmt}.txt"), str(
            tmp_path / f"ref_{fmt}.txt")
        save_trajectory(traj, a, format=fmt, timestamps=ts)
        REF.data_util.save_trajectory(traj, b, format=fmt, timestamps=ts)
        assert open(a).read() == open(b).read(), fmt


def test_golden_frustum_visibility():
    """ops/frustum.is_visible vs the reference's is_visible_torch
    (frustum.py:87-133, projection branch) on identical poses/depths."""
    from isdf_tpu.ops.frustum import is_visible

    H, W, fx, fy, cx, cy = 48, 64, 55.0, 52.0, 31.5, 23.5
    F, N = 3, 800
    # poses: small rotations + offsets, valid rigid transforms
    from isdf_tpu.ops.geometry import exp_so3
    T = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(F):
        w = RNG.normal(0, 0.2, 3).astype(np.float32)
        T[i, :3, :3] = np.asarray(exp_so3(jnp.asarray(w)))
        T[i, :3, 3] = RNG.normal(0, 0.4, 3)
    depth = RNG.uniform(0.5, 3.0, (F, H, W)).astype(np.float32)
    pts = RNG.uniform(-2, 4, (N, 3)).astype(np.float32)

    ref = REF.frustum.is_visible_torch(
        torch.from_numpy(pts), torch.from_numpy(T),
        torch.from_numpy(depth), H, W, fx, fy, cx, cy,
        trunc=0.2).numpy()
    ours = np.asarray(is_visible(jnp.asarray(pts), jnp.asarray(T),
                                 jnp.asarray(depth), fx, fy, cx, cy,
                                 trunc=0.2))
    # boolean masks must agree except where u/v sits within float eps of
    # an image border (int truncation tie) — allow zero mismatches first
    np.testing.assert_array_equal(ours, ref)


def test_golden_eval_metrics():
    """eval/metrics.py CHOMP / linear / binned / accuracy / completion vs
    the reference's eval/metrics.py:41-158 on identical inputs."""
    from isdf_tpu.eval import metrics as MET

    sdf = RNG.uniform(-1.5, 3.5, 500).astype(np.float64)
    np.testing.assert_allclose(MET.chomp_cost(sdf.copy(), epsilon=2.0),
                               REF.metrics.chomp_cost(sdf.copy(),
                                                      epsilon=2.0),
                               atol=1e-12)
    np.testing.assert_allclose(MET.linear_cost(sdf.copy(), epsilon=1.5),
                               REF.metrics.linear_cost(sdf.copy(),
                                                       epsilon=1.5),
                               atol=1e-12)

    gt = RNG.uniform(-0.5, 2.0, (6, 400))
    diff = np.abs(RNG.normal(0, 0.1, (6, 400)))
    np.testing.assert_allclose(MET.binned_losses(diff, gt),
                               REF.metrics.binned_losses(diff, gt),
                               atol=1e-12)

    gt_pts = RNG.uniform(-1, 1, (300, 3))
    rec_pts = gt_pts + RNG.normal(0, 0.02, (300, 3))
    np.testing.assert_allclose(MET.accuracy(gt_pts, rec_pts),
                               REF.metrics.accuracy(gt_pts, rec_pts),
                               atol=1e-12)
    np.testing.assert_allclose(MET.completion(gt_pts, rec_pts),
                               REF.metrics.completion(gt_pts, rec_pts),
                               atol=1e-12)


def test_golden_checkpoint_export_into_reference_model():
    """The reference's own SDFMap.load_state_dict accepts our exported
    checkpoint (utils/checkpoint.save_reference_checkpoint) and the two
    networks then compute the same function — proof that reference
    tooling (plot_utils.py load path) can consume maps trained here."""
    from isdf_tpu.models import sdf_mlp as M
    from isdf_tpu.utils.checkpoint import save_reference_checkpoint

    ref_map, model, _ = _ref_model_and_ours()
    # OUR params, freshly initialised (not mirrored from the reference)
    params = M.init_params(jax.random.PRNGKey(42), model)

    ck = save_reference_checkpoint(None, params, step=11)
    missing = ref_map.load_state_dict(ck["model_state_dict"])
    assert not missing.missing_keys and not missing.unexpected_keys

    pts = RNG.uniform(-2, 2, (200, 3)).astype(np.float32)
    with torch.no_grad():
        r = ref_map(torch.from_numpy(pts)).numpy()
    from isdf_tpu.models.sdf_mlp import apply
    o = np.asarray(apply(params, jnp.asarray(pts), model))
    np.testing.assert_allclose(o, r, atol=1e-5)


def test_golden_autograd_gradient():
    """jax.grad spatial gradient (sdf_and_grad) vs the reference's
    torch.autograd gradient() (fc_map.py:12-22) on shared weights."""
    ref_map, model, params = _ref_model_and_ours()
    pts = RNG.uniform(-2, 2, (100, 3)).astype(np.float32)
    tp = torch.from_numpy(pts).requires_grad_()
    sdf = ref_map(tp)
    r_grad = REF.fc_map.gradient(tp, sdf).detach().numpy()
    from isdf_tpu.models.sdf_mlp import sdf_and_grad
    o_sdf, o_grad = sdf_and_grad(params, jnp.asarray(pts), model)
    np.testing.assert_allclose(np.asarray(o_sdf), sdf.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_grad), r_grad, atol=1e-4,
                               rtol=1e-4)


def test_golden_render_depth():
    """ops/render.py sdf_render_depth vs reference render.py:12-35.
    Includes rays with no crossing and crossing-at-last-sample."""
    R, S = 64, 11
    z = np.sort(RNG.uniform(0.2, 4.0, (R, S)), axis=1).astype(np.float32)
    sdf = RNG.normal(size=(R, S)).astype(np.float32) * 0.5
    sdf[:8] = np.abs(sdf[:8])              # no crossing
    sdf[8:12] = np.abs(sdf[8:12])
    sdf[8:12, -1] = -0.1                   # crossing at last sample
    r = REF.render.sdf_render_depth(
        torch.from_numpy(z), torch.from_numpy(sdf)).numpy()
    from isdf_tpu.ops.render import sdf_render_depth
    o = np.asarray(sdf_render_depth(jnp.asarray(z), jnp.asarray(sdf)))
    # Exact agreement wherever a crossing exists. For NO-crossing rays
    # the reference's argmax-tie lands on index 0 and its zeroing branch
    # (render.py:27) only catches index S-1, so it returns z[0]+sdf[0]
    # garbage; we implement the comment's stated intent (depth 0) — a
    # documented divergence, compared accordingly.
    crossing = (sdf < 0).any(axis=1)
    np.testing.assert_allclose(o[crossing], r[crossing], atol=1e-6)
    assert (o[~crossing] == 0.0).all()
    np.testing.assert_allclose(r[~crossing], z[~crossing, 0]
                               + sdf[~crossing, 0], atol=1e-6)


def test_golden_sample_along_rays_geometry():
    """Point construction o + d*z: our geometry ops reproduce the
    reference sample_along_rays' pc output (sample.py:131-178) given the
    reference's own z_vals (RNG-dependent stratification is seeded and
    read back from the reference)."""
    depth, _, dirs_C, T, _ = _rand_rays(R=32, S=9)
    torch.manual_seed(11)
    pc_ref, z_ref = REF.sample.sample_along_rays(
        torch.from_numpy(T), 0.07, torch.from_numpy(depth) + 0.1,
        8, 3, torch.from_numpy(dirs_C), gt_depth=torch.from_numpy(depth),
        grad=False)
    from isdf_tpu.ops.geometry import origin_dirs_W
    o, d = origin_dirs_W(jnp.asarray(T), jnp.asarray(dirs_C))
    pc_ours = (np.asarray(o)[:, None, :]
               + np.asarray(d)[:, None, :] * z_ref.numpy()[:, :, None])
    np.testing.assert_allclose(pc_ours, pc_ref.numpy(), atol=1e-5)
    # layout contract: S = n_surf + n_strat, surface block FIRST, and
    # z[:, 0] is the exact depth (sample.py:158-173)
    assert z_ref.shape == (32, 11)
    np.testing.assert_allclose(z_ref.numpy()[:, 0], depth, atol=1e-6)


def test_golden_ray_dirs_C():
    """ops/geometry.py ray_dirs_C vs reference transform.py:13-33,
    z and euclidean depth conventions (reference adds a batch dim;
    ours broadcasts)."""
    from isdf_tpu.ops import geometry as G
    H, W, fx, fy, cx, cy = 13, 17, 51.3, 49.2, 8.1, 6.4
    for depth_type in ("z", "euclidean"):
        r = REF.transform.ray_dirs_C(
            2, H, W, fx, fy, cx, cy, "cpu", depth_type=depth_type).numpy()
        o = np.asarray(G.ray_dirs_C(H, W, fx, fy, cx, cy,
                                    depth_type=depth_type))
        np.testing.assert_allclose(o, r[0], atol=1e-6)
        np.testing.assert_allclose(o, r[1], atol=1e-6)


def test_golden_pointcloud_from_depth():
    """Backprojection vs reference pointcloud_from_depth_torch
    (transform.py:169-196), including NaN-invalid pixels and the
    euclidean convention."""
    from isdf_tpu.ops import geometry as G
    H, W, fx, fy, cx, cy = 24, 31, 40.0, 42.0, 15.5, 12.0
    depth = RNG.uniform(0.5, 4.0, (H, W)).astype(np.float32)
    depth[3:6, 7:11] = np.nan
    for depth_type in ("z", "euclidean"):
        r = REF.transform.pointcloud_from_depth_torch(
            torch.from_numpy(depth), fx, fy, cx, cy,
            depth_type=depth_type).numpy()
        o = np.asarray(G.pointcloud_from_depth(
            jnp.asarray(depth), fx, fy, cx, cy, depth_type=depth_type))
        np.testing.assert_allclose(o, r, atol=1e-5, equal_nan=True)


def test_golden_estimate_pointcloud_normals():
    """Organised-pointcloud normals vs the reference's 8-neighbour
    best-pair cross product (transform.py:215-270), on a smooth random
    surface with a NaN hole. Identical neighbour selection is required
    (argmin over the same 8 pair distances), so values must agree
    exactly up to float error; NaN patterns must coincide at the
    unobserved hole and the d-wide border."""
    from scipy.ndimage import gaussian_filter
    from isdf_tpu.ops import geometry as G
    H, W, f = 26, 34, 40.0
    depth = gaussian_filter(RNG.uniform(1.0, 3.0, (H, W)), 3.0)
    depth = depth.astype(np.float32)
    depth[10:14, 20:23] = np.nan
    pc_t = REF.transform.pointcloud_from_depth_torch(
        torch.from_numpy(depth), f, f, W / 2, H / 2)
    r = REF.transform.estimate_pointcloud_normals(pc_t).numpy()
    o = np.asarray(G.estimate_pointcloud_normals(
        G.pointcloud_from_depth(jnp.asarray(depth), f, f, W / 2, H / 2)))
    assert o.shape == r.shape
    np.testing.assert_array_equal(np.isnan(o).any(-1), np.isnan(r).any(-1))
    m = ~np.isnan(r).any(-1)
    np.testing.assert_allclose(o[m], r[m], atol=1e-4)


def test_golden_make_3D_grid():
    """Eval-grid construction vs reference make_3D_grid /
    transform_3D_grid (transform.py:273-304) with a rigid transform and
    scale (the scene-frame mapping used for the 200^3 eval grid)."""
    from scipy.spatial.transform import Rotation
    from isdf_tpu.ops import geometry as G
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec([0.3, -0.2, 0.9]).as_matrix()
    T[:3, 3] = [0.5, -1.0, 2.0]
    scale = np.asarray([2.0, 3.0, 1.5], np.float32)
    r = REF.transform.make_3D_grid(
        (-1.0, 1.0), 9, "cpu", transform=torch.from_numpy(T),
        scale=torch.from_numpy(scale)).numpy()
    o = np.asarray(G.make_3D_grid((-1.0, 1.0), 9, transform=jnp.asarray(T),
                                  scale=jnp.asarray(scale)))
    np.testing.assert_allclose(o, r, atol=1e-5)


def test_golden_render_normals():
    """Camera-frame normals at rendered depths vs reference
    render.render_normals (render.py:39-57), driving the reference's
    autograd path with an analytic sphere SDF and ours with its exact
    gradient."""
    from isdf_tpu.ops.render import render_normals_C
    R = 40
    depth, _, dirs_C, T, _ = _rand_rays(R=R)
    T1 = T[:1].copy()                       # one camera, R rays
    T1[:, :3, 3] = [0.4, -0.2, 3.0]

    def ref_sphere(pc):
        return pc.norm(dim=-1, keepdim=True) - 1.0

    r = REF.render.render_normals(
        torch.from_numpy(T1), torch.from_numpy(depth[None, :]),
        ref_sphere, torch.from_numpy(dirs_C[None, :, :])).detach().numpy()

    def grad_fn(pc):
        return pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)

    o = np.asarray(render_normals_C(jnp.asarray(T1[0]), jnp.asarray(depth),
                                    grad_fn, jnp.asarray(dirs_C)))
    np.testing.assert_allclose(o, r[0], atol=1e-5)


def test_golden_fixed_pts_eval_protocol(tmp_path):
    """The ENTIRE fixed-points evaluation protocol vs the reference's
    fixed_pts_eval (isdf/eval/eval_pts.py:96-299), executed end-to-end on
    identical inputs: same frames, same mask files, same pre-baked
    full-volume points, same GT grid interpolator, same predicted
    SDF/grad functions.  This certifies the deterministic torch RNG
    stream (sample_rays, eval_pts.py:354-400), the mask plumbing, the
    vis-is-concatenation / vox-is-leading-split region semantics
    (sub_eval, eval_pts.py:18-64), the NESTED vox-subset gradient chain
    (eval_pts.py:148-191), and the vox_res.json numbers themselves."""
    import isdf_tpu.eval.eval_pts as OURS

    F, H, W = 3, 24, 32
    fx = fy = W / 2.0
    cx, cy = W / 2.0 - 0.5, H / 2.0 - 0.5
    dirs_C_t = REF.transform.ray_dirs_C(1, H, W, fx, fy, cx, cy, "cpu",
                                        depth_type="z")
    rng = np.random.default_rng(11)
    depth = rng.uniform(0.5, 3.0, (F, H, W)).astype(np.float32)
    depth[rng.random((F, H, W)) < 0.05] = 0.0       # invalid pixels
    from scipy.spatial.transform import Rotation
    T = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(F):
        T[i, :3, :3] = Rotation.from_rotvec(
            rng.normal(size=3) * 0.2).as_matrix().astype(np.float32)
        T[i, :3, 3] = (rng.normal(size=3) * 0.3).astype(np.float32)

    # GT SDF: sphere sampled on a grid covering every reachable point
    dims, ext = 24, 8.0
    vsm = 2 * ext / (dims - 1)
    tf = np.eye(4)
    tf[0, 0] = tf[1, 1] = tf[2, 2] = vsm
    tf[:3, 3] = -ext
    gx = np.arange(dims) * vsm - ext
    X, Y, Z = np.meshgrid(gx, gx, gx, indexing="ij")
    c = np.array([0.1, -0.2, 0.3])
    grid = np.sqrt((X - c[0]) ** 2 + (Y - c[1]) ** 2
                   + (Z - c[2]) ** 2) - 1.37
    gt_interp = REF.sdf_util.sdf_interpolator(grid, tf)

    def sdf_fn(p):                              # the "trained model"
        p = np.asarray(p, np.float64)
        return (np.linalg.norm(p - c, axis=-1) - 1.2
                + 0.05 * np.sin(p[..., 0]))

    def grad_fn(p):
        p = np.asarray(p, np.float64)
        d = p - c
        g = d / np.linalg.norm(d, axis=-1, keepdims=True)
        g[:, 0] += 0.05 * np.cos(p[:, 0])
        return g

    # mask files sized to the deterministic samplers
    t, t_str = 1.0, "1.000"
    d_t, T_t = torch.from_numpy(depth), torch.from_numpy(T)
    N = len(REF.eval_pts.sample_visible_region(
        t_str, d_t, T_t, "replicaCAD", dirs_C_t))
    M = len(REF.eval_pts.sample_surface(t_str, d_t, T_t, dirs_C_t))
    mdir = tmp_path / "eval_pts" / t_str
    mdir.mkdir(parents=True)
    vis_gt = rng.random(N) > 0.2
    vis_vox = rng.random(int(vis_gt.sum())) > 0.4
    vis_ggrad = rng.random(N) > 0.3
    surf_gt = rng.random(M) > 0.25
    np.save(mdir / "vis_valid_gt_sdf.npy", vis_gt)
    np.save(mdir / "vis_valid_vox_sdf.npy", vis_vox)
    np.save(mdir / "vis_valid_gt_grad.npy", vis_ggrad)
    np.save(mdir / "vis_valid_vox_grad.npy",
            rng.random(int(vis_ggrad.sum())) > 0.5)
    np.save(mdir / "surf_valid_gt_sdf.npy", surf_gt)
    np.save(mdir / "surf_valid_vox_sdf.npy",
            rng.random(int(surf_gt.sum())) > 0.4)

    # pre-baked full-volume points + gt values
    vroot = tmp_path / "vol"
    (vroot / "full_vol").mkdir(parents=True)
    vol_pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    vol_gt = REF.sdf_util.eval_sdf_interp(gt_interp, vol_pts,
                                          handle_oob="except")
    np.save(vroot / "full_vol" / "replicaCAD.npy", vol_pts)
    np.save(vroot / "full_vol" / "gt_apt_test.npy", vol_gt)

    seq_dir = str(tmp_path / "seqs" / "apt_test")
    os.makedirs(seq_dir)

    class _Cached:                              # SceneCache shim
        def __getitem__(self, ixs):
            return {"depth": depth[ixs], "T": T[ixs]}

    ref_res = REF.eval_pts.fixed_pts_eval(
        sdf_fn, t, str(tmp_path / "eval_pts") + "/", seq_dir,
        "replicaCAD", _Cached(), dirs_C_t, gt_interp,
        str(vroot) + "/", F, grad_fn=grad_fn)

    def gt_fn(p):
        return REF.sdf_util.eval_sdf_interp(
            gt_interp, np.asarray(p), handle_oob="mask")[0]

    our_res = OURS.fixed_pts_eval(
        sdf_fn, t, str(tmp_path / "eval_pts"), depth, T,
        np.asarray(dirs_C_t)[0], gt_fn, dataset_format="replicaCAD",
        grad_fn=grad_fn, eval_pts_root=str(vroot), seq_dir=seq_dir)

    def _cmp(r, o):
        np.testing.assert_allclose(o["av_l1"], r["av_l1"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(o["binned_l1"], float),
                                   np.asarray(r["binned_l1"], float),
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(o["l1_chomp_costs"],
                                   r["l1_chomp_costs"], rtol=1e-6)

    for region in ["rays", "visible_surf"]:
        for split in ["vis", "vox"]:
            _cmp(ref_res[region][split], our_res[region][split])
    _cmp(ref_res["vol"], our_res["vol"])
    np.testing.assert_allclose(our_res["rays"]["vis"]["av_cossim"],
                               ref_res["rays"]["vis"]["av_cossim"],
                               rtol=1e-5)
    np.testing.assert_allclose(our_res["rays"]["vox"]["av_cossim"],
                               ref_res["rays"]["vox"]["av_cossim"],
                               rtol=1e-5)
    # sanity: the vox split must genuinely differ from vis on these masks
    assert not np.isclose(ref_res["rays"]["vis"]["av_l1"],
                          ref_res["rays"]["vox"]["av_l1"])
