"""Multi-scene lockstep training (parallel/multi_scene.py).

Contract: the joint K-scene bundle computes EXACTLY the per-scene
train_bundle math — stacking the states and lax.map'ing the same body
must not change any scene's trajectory — and the lockstep loop trains
two independent scenes to decreasing SDF error in one program.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.data.synthetic import SyntheticDataset, SyntheticScene
from isdf_tpu.engine.trainer import Trainer
from isdf_tpu.eval.protocol import eval_sdf
from isdf_tpu.parallel.multi_scene import (MultiSceneStepper,
                                           multi_scene_loop)
from isdf_tpu.utils.config import Config

pytestmark = pytest.mark.slow


def small_cfg(**kw):
    base = dict(
        dataset_format="synthetic",
        n_rays=40, n_strat_samples=9, n_surf_samples=4,
        hidden_feature_size=64, hidden_layers_block=1, n_embed_funcs=4,
        kf_buffer_size=12, iters_per_frame=10, iters_per_kf=30,
        bounds_method="ray", do_eval=False, fps=30.0)
    base.update(kw)
    return Config().replace(**base)


def _make_pair(seed_a=1, seed_b=2, **cfg_kw):
    """Two different scenes + trainers sharing the step signature."""
    ds_a = SyntheticDataset(SyntheticScene(extents=(5.0, 3.0, 4.0)),
                            n_frames=120, H=48, W=64)
    ds_b = SyntheticDataset(SyntheticScene(extents=(4.0, 2.6, 6.0)),
                            n_frames=120, H=48, W=64, orbit_radius=1.1)
    cfg = small_cfg(**cfg_kw)
    tr_a = Trainer(cfg, dataset=ds_a, seed=seed_a)
    tr_b = Trainer(cfg, dataset=ds_b, seed=seed_b)
    for tr in (tr_a, tr_b):
        for fid in (0, 40, 80):
            tr.last_is_keyframe = True
            tr.add_frame(tr.get_data([fid])[0])
    return tr_a, tr_b


def _clone_device_state(src: Trainer, dst: Trainer):
    dst.params = jax.tree_util.tree_map(jnp.copy, src.params)
    dst.opt_state = jax.tree_util.tree_map(jnp.copy, src.opt_state)
    dst.buffer = jax.tree_util.tree_map(jnp.copy, src.buffer)
    dst._key = jnp.copy(src._key)
    dst._bundle_key = jnp.copy(src._bundle_key)
    dst.steps_taken = src.steps_taken
    dst.noise_std = src.noise_std
    dst.lr_scale = src.lr_scale
    dst.tail_mode = src.tail_mode


def test_joint_matches_per_scene_bundles():
    """stepper.run_steps(n) == each trainer.run_steps(n), same keys."""
    tr_a, tr_b = _make_pair()
    ref_a, ref_b = _make_pair()
    _clone_device_state(tr_a, ref_a)
    _clone_device_state(tr_b, ref_b)

    stepper = MultiSceneStepper([tr_a, tr_b])
    joint = stepper.run_steps(5)
    sa = ref_a.run_steps(5)
    sb = ref_b.run_steps(5)

    for tr, ref in ((tr_a, ref_a), (tr_b, ref_b)):
        for la, lb in zip(jax.tree_util.tree_leaves(tr.params),
                          jax.tree_util.tree_leaves(ref.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(tr.buffer.frame_avg_loss),
            np.asarray(ref.buffer.frame_avg_loss), rtol=2e-5, atol=1e-6)
    for sc_joint, sc_ref in ((joint[0], sa), (joint[1], sb)):
        for k in ("total_loss", "sdf_loss"):
            if k in sc_ref:
                np.testing.assert_allclose(sc_joint[k], sc_ref[k],
                                           rtol=2e-4, atol=1e-6)


def test_joint_scenes_are_independent():
    """Scene B's presence must not change scene A's update (keys are
    per-trainer, state is per-scene)."""
    tr_a, tr_b = _make_pair()
    solo_a, _ = _make_pair()
    _clone_device_state(tr_a, solo_a)
    tr_c, _ = _make_pair(seed_a=7)  # a DIFFERENT partner for the A copy

    MultiSceneStepper([tr_a, tr_b]).run_steps(3)
    MultiSceneStepper([solo_a, tr_c]).run_steps(3)

    for la, lb in zip(jax.tree_util.tree_leaves(tr_a.params),
                      jax.tree_util.tree_leaves(solo_a.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)


def test_masked_joint_matches_solo_bundles():
    """Per-scene step masking: stepper.run_steps(10, n_actives=[3, 7])
    must equal trainer A solo-running 3 steps and B 7 — AND stay equal
    when both continue, because per-step RNG is indexed by the global
    step counter, not a per-bundle split (engine/step.py)."""
    tr_a, tr_b = _make_pair()
    ref_a, ref_b = _make_pair()
    _clone_device_state(tr_a, ref_a)
    _clone_device_state(tr_b, ref_b)

    stepper = MultiSceneStepper([tr_a, tr_b])
    stepper.run_steps(10, n_actives=[3, 7])
    assert tr_a.steps_taken == 3 and tr_b.steps_taken == 7
    ref_a.run_steps(3)
    ref_b.run_steps(7)
    # continue with different partitions: the streams must stay aligned
    stepper.run_steps(10, n_actives=[10, 10])
    ref_a.run_steps(4)
    ref_a.run_steps(6)
    ref_b.run_steps(10)

    for tr, ref in ((tr_a, ref_a), (tr_b, ref_b)):
        for la, lb in zip(jax.tree_util.tree_leaves(tr.params),
                          jax.tree_util.tree_leaves(ref.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(tr.buffer.frame_avg_loss),
            np.asarray(ref.buffer.frame_avg_loss), rtol=2e-5, atol=1e-6)


def test_masked_steps_are_noops():
    """n_active=0 must leave a scene's state bit-identical (the scene's
    bundle is cond-skipped) and log NaN scalars."""
    tr_a, tr_b = _make_pair()
    p_before = jax.tree_util.tree_map(np.asarray, tr_b.params)
    fal_before = np.asarray(tr_b.buffer.frame_avg_loss)

    stepper = MultiSceneStepper([tr_a, tr_b])
    logs = stepper.run_steps(5, n_actives=[5, 0])
    assert tr_b.steps_taken == 0
    for la, lb in zip(jax.tree_util.tree_leaves(tr_b.params),
                      jax.tree_util.tree_leaves(p_before)):
        np.testing.assert_array_equal(np.asarray(la), lb)
    np.testing.assert_array_equal(
        np.asarray(tr_b.buffer.frame_avg_loss), fal_before)
    assert np.all(np.isnan(logs[1]["total_loss"]))
    assert not np.any(np.isnan(logs[0]["total_loss"]))
    # idle scenes are not billed by default
    assert tr_b.tot_step_time == 0.0 and tr_a.tot_step_time > 0.0


def test_bundle_partition_invariance_solo():
    """Solo trainer: the SAME trajectory regardless of bundle sizes —
    per-step keys are fold_in(base, global_step)."""
    tr_a, _ = _make_pair()
    ref_a, _ = _make_pair()
    _clone_device_state(tr_a, ref_a)
    tr_a.run_steps(7)
    tr_a.run_steps(3)
    ref_a.run_steps(2)
    ref_a.run_steps(5)
    ref_a.run_steps(3)
    for la, lb in zip(jax.tree_util.tree_leaves(tr_a.params),
                      jax.tree_util.tree_leaves(ref_a.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)


STEP_DT = 1e-3


def _pin(tr):
    tr._per_step_device_s = STEP_DT
    tr._bill_exact = True


def _fresh_pinned_pair():
    # explicit steps_per_bundle: every loop below must share the same
    # bundle quantisation (tail lr anneal updates at bundle boundaries)
    tr_a, tr_b = _make_pair(steps_per_bundle=10)
    for tr in (tr_a, tr_b):
        tr.clear_keyframes()
        tr.steps_since_frame = 0
        tr.optim_frames = 0
        tr.last_is_keyframe = False
        _pin(tr)
    return tr_a, tr_b


def _run_fleet(start_times, max_steps=250):
    tr_a, tr_b = _fresh_pinned_pair()
    stepper = MultiSceneStepper([tr_a, tr_b])
    stepper._per_step_device_s = STEP_DT
    stepper._bill_exact = True
    out = multi_scene_loop([tr_a, tr_b], max_steps=max_steps,
                           extra_opt_steps=50, start_times=start_times,
                           stepper=stepper)
    return tr_a, tr_b, out


def test_staggered_fleet_single_shape_and_start_invariance():
    """A staggered-start two-scene fleet must (a) compile exactly ONE
    joint bundle shape, and (b) leave every scene's trajectory
    BIT-IDENTICAL to the same fleet without the stagger — a scene's
    map depends only on its own state/keys/steps, never on when it
    joined or what its chip-mates were doing. Clocks are pinned
    (_bill_exact + fixed per-step device cost) so ingestion is
    deterministic; per-step RNG is global-step-indexed, so both runs
    execute the SAME compiled program on the same per-scene operands
    and the comparison is exact on every backend."""
    B = 10
    # scene B joins after 3 bundles of fleet time vs. immediately
    tr_a1, tr_b1, out1 = _run_fleet([0.0, 3 * B * STEP_DT])
    tr_a2, tr_b2, out2 = _run_fleet([0.0, 0.0])

    assert out1[0]["compiled_shapes"] == [B]  # (a) one compiled shape
    assert out1[0]["steps"] == 250 and out1[1]["steps"] == 250
    assert out1[1]["steps"] == out2[1]["steps"]
    for tr, ref in ((tr_a1, tr_a2), (tr_b1, tr_b2)):
        for la, lb in zip(jax.tree_util.tree_leaves(tr.params),
                          jax.tree_util.tree_leaves(ref.params)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(
            np.asarray(tr.buffer.frame_avg_loss),
            np.asarray(ref.buffer.frame_avg_loss))
    # the late scene's own clock starts at ITS activation: both runs
    # bill B the same sim time
    assert tr_b1.tot_step_time == pytest.approx(tr_b2.tot_step_time)


def test_staggered_fleet_schedule_matches_solo():
    """The joint loop must drive each scene's HOST state machine
    exactly like the solo train_loop: same ingested frames, same
    keyframe promotions, same step count, same billed sim clock.
    (Continuous state is compared at bundle level in
    test_masked_joint_matches_solo_bundles — over a 250-step loop the
    Gumbel window selection chaotically amplifies backend-level
    1-ulp reduction differences between the two compiled programs, so
    the loop-level contract is the discrete trajectory. On TPU the
    full comparison measured bit-identical.)"""
    from isdf_tpu.engine.loop import train_loop

    tr_a, tr_b, out = _run_fleet([0.0, 3 * 10 * STEP_DT])

    ref_a, ref_b = _fresh_pinned_pair()
    train_loop(ref_a, max_steps=250, extra_opt_steps=50)
    train_loop(ref_b, max_steps=250, extra_opt_steps=50)

    for tr, ref in ((tr_a, ref_a), (tr_b, ref_b)):
        assert tr.steps_taken == ref.steps_taken == 250
        assert [f.frame_id for f in tr.frames.frames] == \
            [f.frame_id for f in ref.frames.frames]
        assert int(np.asarray(tr.buffer.count)) == \
            int(np.asarray(ref.buffer.count))
        assert tr.tot_step_time == pytest.approx(ref.tot_step_time)


def test_fleet_mesh_matches_per_scene_bundles():
    """Fleet mode (scene axis shard_map'ed over a 2-device mesh) must
    reproduce each scene's solo trajectory exactly — scenes are
    independent, so sharding them across devices is math-invariant."""
    from jax.sharding import Mesh

    tr_a, tr_b = _make_pair()
    ref_a, ref_b = _make_pair()
    _clone_device_state(tr_a, ref_a)
    _clone_device_state(tr_b, ref_b)

    mesh = Mesh(np.array(jax.devices()[:2]), ("scene",))
    MultiSceneStepper([tr_a, tr_b], mesh=mesh).run_steps(5)
    ref_a.run_steps(5)
    ref_b.run_steps(5)

    for tr, ref in ((tr_a, ref_a), (tr_b, ref_b)):
        for la, lb in zip(jax.tree_util.tree_leaves(tr.params),
                          jax.tree_util.tree_leaves(ref.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-6)


def test_fleet_mesh_validation():
    from jax.sharding import Mesh

    tr_a, tr_b = _make_pair()
    bad_axis = Mesh(np.array(jax.devices()[:2]), ("dp",))
    with pytest.raises(ValueError, match="scene"):
        MultiSceneStepper([tr_a, tr_b], mesh=bad_axis)
    indivisible = Mesh(np.array(jax.devices()[:4]), ("scene",))
    with pytest.raises(ValueError, match="divide"):
        MultiSceneStepper([tr_a, tr_b], mesh=indivisible)


def test_signature_mismatch_rejected():
    ds = SyntheticDataset(SyntheticScene(extents=(5.0, 3.0, 4.0)),
                          n_frames=60, H=48, W=64)
    tr_a = Trainer(small_cfg(), dataset=ds, seed=1)
    tr_b = Trainer(small_cfg(n_rays=80), dataset=ds, seed=2)
    with pytest.raises(ValueError, match="n_rays"):
        MultiSceneStepper([tr_a, tr_b])


def test_clock_bills_full_joint_time_to_every_scene():
    tr_a, tr_b = _make_pair()
    stepper = MultiSceneStepper([tr_a, tr_b])
    stepper.run_steps(4)
    assert tr_a.tot_step_time > 0
    # shared-chip semantics: both scenes billed the SAME joint dt
    assert tr_a.tot_step_time == pytest.approx(tr_b.tot_step_time)
    assert tr_a.steps_taken == 4 and tr_b.steps_taken == 4


def test_clock_rate_cap_floors_joint_billing():
    """cfg.step_rate_cap applies per scene in the joint stepper: a
    capped scene bills at least n_active/cap perception-seconds even
    when the shared joint bundle ran faster (same floor semantics as
    Trainer.run_steps)."""
    tr_a, tr_b = _make_pair(step_rate_cap=2.0)
    stepper = MultiSceneStepper([tr_a, tr_b])
    stepper._per_step_device_s = 1e-4   # joint bundle far faster than cap
    stepper._bill_exact = True
    stepper.run_steps(4)
    assert tr_a.tot_step_time == pytest.approx(4 / 2.0)
    assert tr_b.tot_step_time == pytest.approx(4 / 2.0)


def test_lockstep_loop_max_time_s_stops_early():
    tr_a, tr_b = _make_pair()
    out = multi_scene_loop([tr_a, tr_b], max_steps=10 ** 6,
                           max_time_s=1e-4)
    # the clock check runs per round: the loop must stop after a
    # handful of bundles once every scene's sim clock passes the cap
    assert out[0]["steps"] < 1000
    assert tr_a.tot_step_time > 1e-4


def test_lockstep_loop_trains_two_scenes():
    ds_a = SyntheticDataset(SyntheticScene(extents=(5.0, 3.0, 4.0)),
                            n_frames=40, H=48, W=64)
    ds_b = SyntheticDataset(SyntheticScene(extents=(4.0, 2.6, 6.0)),
                            n_frames=40, H=48, W=64, orbit_radius=1.1)
    cfg = small_cfg()
    tr_a = Trainer(cfg, dataset=ds_a, seed=1)
    tr_b = Trainer(cfg, dataset=ds_b, seed=2)
    maes0 = []
    for tr in (tr_a, tr_b):
        tr.last_is_keyframe = True
        tr.add_frame(tr.get_data([0])[0])
        maes0.append(eval_sdf(tr, samples=2000, visible_region=True,
                              seed=0)["av_l1"])
        # undo eval's clock-free bookkeeping side effects: none (eval
        # does not touch the clock), but drop the preloaded frame count
        tr.clear_keyframes()
        tr.steps_since_frame = 0
        tr.optim_frames = 0
        tr.last_is_keyframe = False

    out = multi_scene_loop([tr_a, tr_b], max_steps=400,
                           extra_opt_steps=50)
    assert len(out) == 2
    for i, tr in enumerate((tr_a, tr_b)):
        assert out[i]["steps"] >= 400 or out[i]["tot_step_time"] > 0
        assert out[i]["n_keyframes"] >= 1
        mae = eval_sdf(tr, samples=2000, visible_region=True,
                       seed=0)["av_l1"]
        assert mae < maes0[i], (
            f"scene {i}: MAE {mae:.4f} did not improve on {maes0[i]:.4f}")
