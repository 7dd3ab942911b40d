"""Multi-scene lockstep training: K independent SDF maps on ONE chip.

The reference dedicates one process + one CUDA device to one scene
(isdf/train/train.py:283 — a single synchronous Trainer loop); mapping
K scenes means K GPUs. On TPU the fused step at the reference's
per-step workload is dependency-bound, not capacity-bound (docs/
PERF.md: the chained [512,256]x[256,256] matmuls hold the MXU at ~46%
of peak and no restructuring recovers it), so a second scene's step
costs far less than a second chip would.

This module trains K scenes inside ONE jitted device program per
bundle:

  - the K trainers' (params, opt_state, arena) pytrees are stacked
    on a leading scene axis INSIDE the program (HBM-speed copies),
  - ``lax.map`` runs the fused step bundle over the scene axis — one
    compiled body regardless of K, K sequential kernel invocations,
    zero host round-trips between scenes,
  - the updated states are sliced back out and handed back to the
    per-Trainer host state machines (ingestion, keyframe policy,
    clocks), which stay completely untouched.

Real-time semantics are SHARED-CHIP and honest: every scene's
simulated clock is billed the FULL joint-bundle device time — each
robot experiences the whole wall-clock while receiving 1/K of the
chip's optimisation steps. A K-scene deployment is therefore
real-time iff the joint step rate / K still clears the reference's
~300 steps/s budget (BASELINE.md). Measured on one v5e chip
(experiments/multi_scene_bench.py): 2 scenes sustain >300 steps/s
EACH — one chip concurrently maps two live scenes in real time,
where the reference architecture needs two GPUs.

Scenes are independent: different datasets, poses, scene bounds
(per-scene ``transform``), noise schedules and refinement-tail
phases. They must share the step program's SHAPE signature — camera,
model architecture, ray/sample counts, arena capacity and loss
configuration (`_HOT_FIELDS`) — because one compiled body serves all
scenes.

FLEET MODE (``mesh=``): pass a ``jax.sharding.Mesh`` with a "scene"
axis and the stacked scene axis is shard_map'ed over the mesh — each
device group runs its own scenes' bundles CONCURRENTLY (K/D scenes
per device, sequential within a device, parallel across). One
controller process maps a fleet of robots to a pod slice: scenes are
embarrassingly parallel, so there are zero collectives and the scale-
out is linear by construction. The clock billing is unchanged and
stays honest: the joint device time in fleet mode is the per-device
max (≈ one scene's bundle time when K == D), so each robot is billed
what its share of the fleet actually took.
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.engine.trainer import Trainer

# config fields that shape or parameterise the compiled step body
# (engine/step.py::build_step_functions closes over them): scenes in a
# joint program must agree on ALL of these. Everything else — dataset,
# scene bounds, noise schedule, clock state — is free to differ.
_HOT_FIELDS = (
    "n_rays", "window_size", "n_strat_samples", "n_surf_samples",
    "min_depth", "dist_behind_surf", "do_active", "active_frac",
    "bounds_method", "loss_type", "trunc_weight", "trunc_distance",
    "eik_weight", "eik_apply_dist", "grad_weight", "orien_loss",
    "lr", "weight_decay", "scale_output", "scale_input",
    "n_embed_funcs", "gauss_embed", "hidden_layers_block",
    "hidden_feature_size", "optim_embedding", "compute_dtype",
    "mm_precision", "grad_mode", "pallas_interpret", "pe_in_kernel",
    "pc_in_kernel", "pc_surf_budget", "use_pallas", "kf_buffer_size",
    "noisy_depth",
)


def _hot_signature(trainer: Trainer):
    return tuple(getattr(trainer.cfg, f) for f in _HOT_FIELDS) + (
        trainer.H, trainer.W)


class MultiSceneStepper:
    """Joint device stepping for K Trainers (scenes) on one chip.

    Drop-in replacement for calling ``Trainer.run_steps`` on each scene:
    ``stepper.run_steps(n)`` advances ALL scenes by ``n`` fused steps in
    one device program and performs each trainer's run_steps
    bookkeeping (clock billing, step counters, scalar logs) with the
    JOINT bundle's device time.
    """

    def __init__(self, trainers: Sequence[Trainer], mesh=None):
        if len(trainers) < 1:
            raise ValueError("need at least one trainer")
        sig0 = _hot_signature(trainers[0])
        for t in trainers[1:]:
            if _hot_signature(t) != sig0:
                diff = [f for f in _HOT_FIELDS
                        if getattr(t.cfg, f) != getattr(trainers[0].cfg, f)]
                raise ValueError(
                    "scenes must share the step program signature; "
                    f"differing fields: {diff or ['camera H/W']}")
            if t.mesh is not None or trainers[0].mesh is not None:
                raise ValueError("multi-scene + data-parallel mesh is "
                                 "not supported in one program")
        self.trainers: List[Trainer] = list(trainers)
        self.K = len(trainers)
        self.mesh = mesh  # fleet mode: scene axis sharded over devices
        if mesh is not None:
            if "scene" not in mesh.axis_names:
                raise ValueError("fleet mesh needs a 'scene' axis")
            if self.K % mesh.shape["scene"] != 0:
                raise ValueError(
                    f"{self.K} scenes do not divide the mesh's "
                    f"{mesh.shape['scene']}-device scene axis")
        self.sf = trainers[0].fns
        if self.sf.train_bundle_raw is None:
            raise ValueError("step functions lack train_bundle_raw")
        self._joint = self._build_joint()
        self._compiled = set()
        self._per_step_device_s = (
            None if jax.default_backend() == "tpu" else 0.0)
        self._bill_exact = False
        self._sync_overhead_s = trainers[0]._sync_overhead_s

    # ------------------------------------------------------------------
    def _build_joint(self):
        sf = self.sf
        K = self.K
        mesh = self.mesh

        def joint(states, aux, dirs, n_steps: int):
            # stack on-device (HBM-speed): one compiled scan body serves
            # all K scenes; python-unrolling K bundle bodies instead
            # would K-multiply the compile time of the scanned step
            stacked_s = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *states)
            stacked_a = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *aux)

            def run(s, a, d):
                def one(x):
                    (p, o, b), (tr, k, ns, ls, tl) = x
                    return sf.train_bundle_raw(
                        p, o, b, d, tr, k, ns, n_steps=n_steps,
                        lr_scale=ls, tail=tl)
                return jax.lax.map(one, (s, a))

            if mesh is not None:
                # fleet: partition the scene axis over the mesh — each
                # device runs its local K/D scenes' bundles; no
                # collectives exist (scenes are independent), so the
                # scale-out is linear by construction
                from jax.sharding import PartitionSpec as P
                run = jax.shard_map(
                    run, mesh=mesh,
                    in_specs=(P("scene"), P("scene"), P()),
                    out_specs=P("scene"),
                    # pallas out_shapes carry no vma annotation
                    check_vma=False)

            p, o, b, scalars = run(stacked_s, stacked_a, dirs)
            return tuple(
                jax.tree_util.tree_map(lambda x, i=i: x[i],
                                       (p, o, b, scalars))
                for i in range(K))

        return jax.jit(joint, static_argnames=("n_steps",),
                       donate_argnames=("states",),
                       compiler_options=sf.compiler_options)

    def _states_aux(self, keys, copy: bool = False):
        states, aux = [], []
        for tr, k in zip(self.trainers, keys):
            s = (tr.params, tr.opt_state, tr.buffer)
            if copy:
                s = jax.tree_util.tree_map(jnp.copy, s)
            states.append(s)
            aux.append((tr.transform_dev, k,
                        jnp.float32(tr.noise_std),
                        jnp.float32(tr.lr_scale),
                        jnp.bool_(tr.tail_mode)))
        return tuple(states), tuple(aux)

    # ------------------------------------------------------------------
    def _ensure_compiled(self, n_steps: int):
        if n_steps in self._compiled:
            return
        keys = [jax.random.PRNGKey(0)] * self.K
        st, ax = self._states_aux(keys, copy=False)
        self._joint.lower(st, ax, self.sf.dirs,
                          n_steps=n_steps).compile()
        self._compiled.add(n_steps)

    def _timed_throwaway_bundle(self, n_steps: int) -> float:
        """Wall of one warm joint bundle on state COPIES, fetch-synced
        (Trainer._timed_throwaway_bundle semantics)."""
        keys = [jax.random.PRNGKey(0)] * self.K
        st, ax = self._states_aux(keys, copy=True)
        np.asarray(self.trainers[0].buffer.count)  # drain queue
        t0 = time.perf_counter()
        outs = self._joint(st, ax, self.sf.dirs, n_steps=n_steps)
        sc = outs[-1][3]
        names = sorted(sc)
        np.asarray(jnp.stack([sc[k] for k in names]))
        return time.perf_counter() - t0

    def _calibrate_device_time(self):
        """Per-step DEVICE cost of the JOINT bundle, differentially
        (Trainer._calibrate_device_time: min-of-walls at two bundle
        sizes, difference the minima — cancels the tunnel's fixed
        dispatch+fetch chain)."""
        B, B4 = 100, 400
        for n in (B, B4):
            self._ensure_compiled(n)
            self._timed_throwaway_bundle(n)
        was, wbs = [], []
        for _ in range(5):
            was.append(self._timed_throwaway_bundle(B))
            wbs.append(self._timed_throwaway_bundle(B4))
        k = (min(wbs) - min(was)) / (B4 - B)
        ub = min(wbs) / B4
        self._per_step_device_s = k if 0.0 < k <= ub else 0.0

    # ------------------------------------------------------------------
    def run_steps(self, n_steps: int) -> List[Dict[str, np.ndarray]]:
        """Advance ALL scenes by ``n_steps`` fused steps in one device
        program. Returns the per-scene scalar logs (run_steps payload).

        Clock semantics: every scene is billed the FULL joint device
        time (shared-chip real time) — ``dt_joint / frac_time_perception``
        each, exactly as if K reference processes time-shared one
        accelerator."""
        self._ensure_compiled(n_steps)
        if self._per_step_device_s is None:
            self._calibrate_device_time()
        keys = []
        for tr in self.trainers:
            tr._key, k = jax.random.split(tr._key)
            keys.append(k)
        st, ax = self._states_aux(keys, copy=False)
        np.asarray(self.trainers[0].buffer.count)  # drain device queue
        t0 = time.perf_counter()
        outs = self._joint(st, ax, self.sf.dirs, n_steps=n_steps)
        for tr, (p, o, b, _) in zip(self.trainers, outs):
            tr.params, tr.opt_state, tr.buffer = p, o, b
        # ONE stacked fetch across all scenes = the device sync
        names = sorted(outs[0][3])
        flat = np.asarray(jnp.stack(
            [outs[i][3][k2] for i in range(self.K) for k2 in names]))
        wall = time.perf_counter() - t0

        if self._per_step_device_s:
            dt = n_steps * self._per_step_device_s
            if not self._bill_exact:
                dt = min(dt, wall)
            dt = max(dt, 1e-5)
        else:
            dt = max(wall - self._sync_overhead_s, 1e-5)

        results = []
        for i, tr in enumerate(self.trainers):
            sc = {k2: flat[i * len(names) + j]
                  for j, k2 in enumerate(names)}
            tr.tot_step_time += dt / tr.cfg.frac_time_perception
            tr.steps_since_frame += n_steps
            tr.steps_taken += n_steps
            tr.step_timer.add("train", dt, n_steps)
            sc["step_time_ms"] = np.full(n_steps, 1e3 * dt / n_steps)
            results.append(sc)
        return results


def multi_scene_loop(
    trainers: Sequence[Trainer],
    max_steps: int = None,
    max_time_s: float = None,
    extra_opt_steps: int = 400,
    log_fn=None,
) -> List[dict]:
    """Lockstep headless loop over K scenes (engine/loop.py structure,
    joint bundles). Per round: each scene runs its own ingestion /
    keyframe state machine (engine/loop.py steps 1), then ONE joint
    bundle advances every scene by the minimum of the per-scene step
    budgets. A scene whose sequence + refinement tail has finished is
    frozen in-program (lr_scale=0, noise 0) until all scenes finish —
    per-scene ``tail`` / ``lr_scale`` are traced operands, so freezing
    recompiles nothing.

    Returns per-scene summary dicts (steps, sim time, kf count).
    """
    trainers = list(trainers)
    stepper = MultiSceneStepper(trainers)
    cfgs = [t.cfg for t in trainers]
    sizes = [len(t.dataset) for t in trainers]
    max_steps = max_steps if max_steps is not None else min(
        c.n_steps for c in cfgs)
    t_steps = [0] * len(trainers)
    break_at = [-1] * len(trainers)
    tail_start = [0] * len(trainers)
    done = [False] * len(trainers)
    rounds = 0

    while not all(done) and max(t_steps) < max_steps:
        if max_time_s is not None and min(
                tr.tot_step_time for tr in trainers) > max_time_s:
            break
        budgets = []
        for i, tr in enumerate(trainers):
            cfg, t = cfgs[i], t_steps[i]
            if done[i]:
                budgets.append(10 ** 9)
                continue
            finish_optim = tr.steps_since_frame == tr.optim_frames
            if tr.incremental and (finish_optim or t == 0):
                add_new = True if t == 0 else tr.check_keyframe_latest()
                if add_new:
                    fid = tr.get_latest_frame_id()
                    if fid >= sizes[i]:
                        if break_at[i] < 0:
                            break_at[i] = t + extra_opt_steps
                            tail_start[i] = t
                            tr.noise_std = 0.0
                            tr.tail_mode = cfg.tail_loss_window
                            if log_fn:
                                log_fn(f"scene {i}: end of sequence at "
                                       f"step {t}; tail {extra_opt_steps}")
                    else:
                        frame = tr.get_data([fid])[0]
                        tr.add_frame(frame)
                        if t == 0:
                            tr.last_is_keyframe = True
                            tr.optim_frames = 200
            if break_at[i] >= 0 and t >= break_at[i]:
                done[i] = True
                tr.lr_scale = 0.0  # frozen: joint bundles keep running
                tr.noise_std = 0.0
                budgets.append(10 ** 9)
                continue
            budget = max(tr.optim_frames - tr.steps_since_frame, 1)
            if break_at[i] > 0:
                budget = max(min(break_at[i] - t, 100), 1)
                frac = min(max((t - tail_start[i])
                               / max(extra_opt_steps, 1), 0.0), 1.0)
                lo = cfg.tail_lr_min
                tr.lr_scale = lo + (1.0 - lo) * 0.5 * (
                    1.0 + np.cos(np.pi * frac))
            if cfg.steps_per_bundle > 0:
                budget = min(budget, cfg.steps_per_bundle)
            budgets.append(budget)

        if all(done):
            break
        n = int(min(min(budgets), max_steps - max(
            t_steps[i] for i in range(len(trainers)) if not done[i])))
        n = max(n, 1)
        stepper.run_steps(n)
        for i in range(len(trainers)):
            if not done[i]:
                t_steps[i] += n
        rounds += 1
        if log_fn and rounds % 20 == 0:
            msg = "  ".join(
                f"s{i}:t={tr.tot_step_time:.1f}s"
                for i, tr in enumerate(trainers))
            log_fn(f"round {rounds} steps={t_steps} {msg}")

    return [{
        "steps": t_steps[i],
        "tot_step_time": trainers[i].tot_step_time,
        "n_keyframes": int(np.asarray(trainers[i].buffer.count)),
    } for i in range(len(trainers))]
