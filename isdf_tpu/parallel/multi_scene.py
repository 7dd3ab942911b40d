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

  - the K trainers' SMALL state (params, optimiser moments, arena
    statistics — a few MB) is stacked on a leading scene axis inside
    the program; the arena's BIG planes (depth [C,H,W], normals
    [C,H,W,3] — ~2 GB/scene at the production camera and capacity)
    are read-only inside the step, so they are passed as per-scene
    operands and selected per scene iteration with ``lax.switch``:
    they are never stacked, never donated and never returned. Peak
    HBM is therefore ~1x the K-scene state (plus one scene's planes
    transiently), not the ~2x a stacked+donated joint program costs —
    the difference between K=4 at the default arena capacity fitting
    one v5e chip or OOMing it (docs/PERF.md, round-5 note),
  - ``lax.map`` runs the fused step bundle over the scene axis — one
    compiled body regardless of K, K sequential kernel invocations,
    zero host round-trips between scenes,
  - every joint bundle has the SAME compiled length; a scene whose
    per-frame iteration budget is shorter than the bundle masks its
    trailing steps (train_bundle's ``n_active`` operand — a no-op
    that recompiles nothing), and a scene with ``n_active == 0``
    (finished, or staggered and not yet started) skips its whole
    bundle under ``lax.cond``. Desynced per-scene ingestion therefore
    never sprays new compile shapes: the loop compiles exactly ONE
    joint program,
  - per-step RNG inside the bundle is indexed by each scene's GLOBAL
    step counter (engine/step.py), so a scene's trajectory is
    bit-identical to the same scene trained solo with any bundle
    partitioning — lockstep scheduling is an execution detail, not a
    math change.

Real-time semantics are SHARED-CHIP and honest: every scene's
simulated clock is billed the FULL joint-bundle device time — each
robot experiences the whole wall-clock while receiving its share of
the chip's optimisation steps. A K-scene deployment is therefore
real-time iff the joint step rate / K still clears the reference's
~300 steps/s budget (BASELINE.md). Measured on one v5e chip
(experiments/multi_scene_bench.py): 2 scenes sustain >300 steps/s
EACH — one chip concurrently maps two live scenes in real time,
where the reference architecture needs two GPUs.

Scenes are independent: different datasets, poses, scene bounds
(per-scene ``transform``), noise schedules, refinement-tail phases
and START TIMES (``multi_scene_loop(start_times=...)`` — scenes may
join the fleet while others are already mapping). They must share the
step program's SHAPE signature — camera, model architecture,
ray/sample counts, arena capacity and loss configuration
(`_HOT_FIELDS`) — because one compiled body serves all scenes.

FLEET MODE (``mesh=``): pass a ``jax.sharding.Mesh`` with a "scene"
axis and the scene axis is shard_map'ed over the mesh — each device
group runs its own scenes' bundles CONCURRENTLY (K/D scenes per
device, sequential within a device, parallel across). One controller
process maps a fleet of robots to a pod slice: scenes are
embarrassingly parallel, so there are zero collectives and the scale-
out is linear by construction. The clock billing is unchanged and
stays honest: the joint device time in fleet mode is the per-device
max (≈ one scene's bundle time when K == D), so each robot is billed
what its share of the fleet actually took. (Fleet mode stacks the
full per-scene state to shard it — the single-chip memory argument
above applies per device at K/D scenes each.)
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

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


def _small(buf):
    """The arena minus its big read-only planes (see module docstring)."""
    return buf._replace(depth=None, normals=None)


class MultiSceneStepper:
    """Joint device stepping for K Trainers (scenes) on one chip.

    Drop-in replacement for calling ``Trainer.run_steps`` on each scene:
    ``stepper.run_steps(n)`` advances ALL scenes by ``n`` fused steps in
    one device program and performs each trainer's run_steps
    bookkeeping (clock billing, step counters, scalar logs) with the
    JOINT bundle's device time. Per-scene ``n_actives`` mask trailing
    steps so desynced budgets share one compiled shape.
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
        self._joint = (self._build_joint_fleet() if mesh is not None
                       else self._build_joint())
        self._compiled = set()
        self._per_step_device_s = (
            None if jax.default_backend() == "tpu" else 0.0)
        self._bill_exact = False
        self._sync_overhead_s = trainers[0]._sync_overhead_s
        self.last_bundle_dt = 0.0  # device seconds of the last bundle

    # ------------------------------------------------------------------
    def _build_joint(self):
        """Memory-lean single-chip joint program (see module docstring):
        small state stacked + donated; big arena planes per-scene
        operands selected by lax.switch; per-scene cond skips idle
        scenes' whole bundles."""
        sf = self.sf
        K = self.K

        def joint(smalls, aux, frames, dirs, n_steps: int):
            stacked_s = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *smalls)
            stacked_a = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *aux)
            has_normals = frames[0][1] is not None

            def one(x):
                (p, o, sb), (tr, k, ns, ls, tl, s0, na), i = x
                depth_i = jax.lax.switch(
                    i, [(lambda j=j: frames[j][0]) for j in range(K)])
                normals_i = (jax.lax.switch(
                    i, [(lambda j=j: frames[j][1]) for j in range(K)])
                    if has_normals else None)
                buf = sb._replace(depth=depth_i, normals=normals_i)

                def run(_):
                    p2, o2, b2, sc = sf.train_bundle_raw(
                        p, o, buf, dirs, tr, k, ns, n_steps=n_steps,
                        lr_scale=ls, tail=tl, step0=s0, n_active=na)
                    return p2, o2, _small(b2), sc

                def skip(_):
                    # finished / not-yet-started scene: its whole bundle
                    # is skipped at runtime (cond, not select) — an idle
                    # scene costs ~no device time instead of a full
                    # masked bundle
                    sc_shape = jax.eval_shape(run, None)[3]
                    nan_sc = jax.tree_util.tree_map(
                        lambda a: jnp.full(a.shape, jnp.nan, a.dtype),
                        sc_shape)
                    return p, o, sb, nan_sc

                return jax.lax.cond(na > 0, run, skip, None)

            outs = jax.lax.map(one, (stacked_s, stacked_a,
                                     jnp.arange(K, dtype=jnp.int32)))
            return tuple(
                jax.tree_util.tree_map(lambda x, i=i: x[i], outs)
                for i in range(K))

        return jax.jit(joint, static_argnames=("n_steps",),
                       donate_argnames=("smalls",),
                       compiler_options=sf.compiler_options)

    def _build_joint_fleet(self):
        """Fleet joint: the full per-scene state is stacked and the
        scene axis shard_map'ed over the mesh."""
        sf = self.sf
        K = self.K
        mesh = self.mesh

        def joint(states, aux, dirs, n_steps: int):
            stacked_s = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *states)
            stacked_a = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *aux)

            def run(s, a, d):
                def one(x):
                    (p, o, b), (tr, k, ns, ls, tl, s0, na) = x
                    return sf.train_bundle_raw(
                        p, o, b, d, tr, k, ns, n_steps=n_steps,
                        lr_scale=ls, tail=tl, step0=s0, n_active=na)
                return jax.lax.map(one, (s, a))

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

    # ------------------------------------------------------------------
    def _aux(self, n_actives):
        return tuple(
            (tr.transform_dev, tr._bundle_key,
             jnp.float32(tr.noise_std),
             jnp.float32(tr.lr_scale),
             jnp.bool_(tr.tail_mode),
             jnp.int32(tr.steps_taken),
             jnp.int32(n_actives[i]))
            for i, tr in enumerate(self.trainers))

    def _smalls(self, copy: bool = False):
        out = []
        for tr in self.trainers:
            s = (tr.params, tr.opt_state, _small(tr.buffer))
            if copy:
                s = jax.tree_util.tree_map(jnp.copy, s)
            out.append(s)
        return tuple(out)

    def _frames(self):
        return tuple((tr.buffer.depth, tr.buffer.normals)
                     for tr in self.trainers)

    def _full_states(self, copy: bool = False):
        out = []
        for tr in self.trainers:
            s = (tr.params, tr.opt_state, tr.buffer)
            if copy:
                s = jax.tree_util.tree_map(jnp.copy, s)
            out.append(s)
        return tuple(out)

    def _call_joint(self, n_steps: int, n_actives, copy: bool = False):
        ax = self._aux(n_actives)
        if self.mesh is not None:
            return self._joint(self._full_states(copy=copy), ax,
                               self.sf.dirs, n_steps=n_steps)
        return self._joint(self._smalls(copy=copy), ax, self._frames(),
                           self.sf.dirs, n_steps=n_steps)

    # ------------------------------------------------------------------
    def _ensure_compiled(self, n_steps: int):
        if n_steps in self._compiled:
            return
        na = [n_steps] * self.K
        ax = self._aux(na)
        if self.mesh is not None:
            self._joint.lower(self._full_states(), ax, self.sf.dirs,
                              n_steps=n_steps).compile()
        else:
            self._joint.lower(self._smalls(), ax, self._frames(),
                              self.sf.dirs, n_steps=n_steps).compile()
        self._compiled.add(n_steps)

    def _timed_throwaway_bundle(self, n_steps: int) -> float:
        """Wall of one warm joint bundle on SMALL-state copies, fetch-
        synced (Trainer._timed_throwaway_bundle semantics). Only the
        donated small state is copied — the arena's big planes are
        read-only operands, so calibration costs a few MB of HBM, not a
        second copy of the K-scene arena."""
        np.asarray(self.trainers[0].buffer.count)  # drain queue
        t0 = time.perf_counter()
        outs = self._call_joint(n_steps, [n_steps] * self.K, copy=True)
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
    def run_steps(self, n_steps: int,
                  n_actives: Optional[Sequence[int]] = None,
                  bill: Optional[Sequence[bool]] = None,
                  ) -> List[Dict[str, np.ndarray]]:
        """Advance scene i by ``n_actives[i]`` (default: all
        ``n_steps``) fused steps in one fixed-shape device program.
        Returns the per-scene scalar logs; masked steps log NaN.

        Clock semantics: every billed scene (default: scenes with
        active steps) is billed the FULL joint device time
        (shared-chip real time) — ``dt_joint / frac_time_perception``
        each, exactly as if K reference processes time-shared one
        accelerator."""
        if n_actives is None:
            n_actives = [n_steps] * self.K
        n_actives = [int(min(max(n, 0), n_steps)) for n in n_actives]
        if bill is None:
            bill = [n > 0 for n in n_actives]
        self._ensure_compiled(n_steps)
        if self._per_step_device_s is None:
            self._calibrate_device_time()
        np.asarray(self.trainers[0].buffer.count)  # drain device queue
        t0 = time.perf_counter()
        outs = self._call_joint(n_steps, n_actives, copy=False)
        for tr, (p, o, b, _) in zip(self.trainers, outs):
            tr.params, tr.opt_state = p, o
            if self.mesh is not None:
                tr.buffer = b
            else:
                tr.buffer = b._replace(depth=tr.buffer.depth,
                                       normals=tr.buffer.normals)
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
        self.last_bundle_dt = dt

        results = []
        for i, tr in enumerate(self.trainers):
            sc = {k2: flat[i * len(names) + j]
                  for j, k2 in enumerate(names)}
            if bill[i]:
                billed = dt / tr.cfg.frac_time_perception
                if tr.cfg.step_rate_cap > 0:
                    # same floor as Trainer.run_steps: a scene capped at
                    # R steps/s bills at least n/R even when the joint
                    # bundle (shared across K scenes) ran faster
                    billed = max(billed,
                                 n_actives[i] / tr.cfg.step_rate_cap)
                tr.tot_step_time += billed
                tr.step_timer.add("train", dt, max(n_actives[i], 1))
            tr.steps_since_frame += n_actives[i]
            tr.steps_taken += n_actives[i]
            sc["step_time_ms"] = np.full(n_steps, 1e3 * dt / n_steps)
            results.append(sc)
        return results


def multi_scene_loop(
    trainers: Sequence[Trainer],
    max_steps: int = None,
    max_time_s: float = None,
    extra_opt_steps: int = 400,
    log_fn=None,
    start_times: Optional[Sequence[float]] = None,
    stepper: Optional[MultiSceneStepper] = None,
) -> List[dict]:
    """Lockstep headless loop over K scenes (engine/loop.py structure,
    joint bundles). Per round: each started scene runs its own
    ingestion / keyframe state machine (engine/loop.py step 1), then
    ONE joint bundle of the FIXED compiled length (steps_per_bundle)
    advances every scene by its own per-scene budget (train_bundle's
    ``n_active`` masking) — desynced budgets and staggered starts
    never add a compile shape. A scene whose sequence + refinement
    tail has finished, or whose ``start_times[i]`` has not been
    reached by the fleet clock, skips its bundle in-program
    (``n_active=0`` — cond-skipped, ~free).

    ``start_times``: per-scene fleet-clock offsets (seconds) — scene i
    joins once the fleet has run that long; its own simulated clock
    (and therefore its camera stream) starts at activation, exactly
    like launching the reference's one-process-per-scene train.py
    (isdf/train/train.py:282-358) at a later wall time.

    Returns per-scene summary dicts (steps, sim time, kf count,
    compiled joint shapes).
    """
    trainers = list(trainers)
    K = len(trainers)
    if stepper is None:
        stepper = MultiSceneStepper(trainers)
    cfgs = [t.cfg for t in trainers]
    sizes = [len(t.dataset) for t in trainers]
    max_steps = max_steps if max_steps is not None else min(
        c.n_steps for c in cfgs)
    B = max(int(cfgs[0].steps_per_bundle) or 10, 1)
    start_times = ([0.0] * K if start_times is None
                   else [float(s) for s in start_times])
    started = [s <= 0.0 for s in start_times]
    fleet_time = 0.0
    t_steps = [0] * K
    break_at = [-1] * K
    tail_start = [0] * K
    done = [False] * K
    rounds = 0

    while not all(done):
        live = [i for i in range(K) if not done[i]]
        if all(t_steps[i] >= max_steps for i in live):
            break
        if max_time_s is not None:
            billed = [trainers[i].tot_step_time for i in live
                      if started[i]]
            if billed and min(billed) > max_time_s:
                break
        # ---- staggered activation (fleet clock) ----
        if not any(started):
            # nothing runs yet: jump the fleet clock to the first start
            fleet_time = min(start_times)
        for i in range(K):
            if not started[i] and fleet_time >= start_times[i] - 1e-9:
                started[i] = True
                if log_fn:
                    log_fn(f"scene {i}: joins the fleet at fleet "
                           f"t={fleet_time:.2f}s")

        n_actives = [0] * K
        for i, tr in enumerate(trainers):
            cfg, t = cfgs[i], t_steps[i]
            if done[i] or not started[i]:
                continue
            if max_steps - t <= 0:
                # capped scene waiting for chip-mates: fully idle — no
                # ingestion either (the solo loop exits before ingesting
                # past max_steps, engine/loop.py `while t < max_steps`)
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
                continue
            budget = max(tr.optim_frames - tr.steps_since_frame, 1)
            if break_at[i] > 0:
                budget = max(min(break_at[i] - t, 100), 1)
                frac = min(max((t - tail_start[i])
                               / max(extra_opt_steps, 1), 0.0), 1.0)
                lo = cfg.tail_lr_min
                tr.lr_scale = lo + (1.0 - lo) * 0.5 * (
                    1.0 + np.cos(np.pi * frac))
            n_actives[i] = min(budget, B, max_steps - t)

        if not any(n_actives):
            if any(not s for s in started):
                # every running scene is capped/done but a staggered
                # scene still waits: jump the fleet clock to its start
                fleet_time = min(start_times[i] for i in range(K)
                                 if not started[i])
                continue
            break
        # default billing: scenes with active steps get the FULL joint
        # device time (shared-chip semantics); idle scenes (finished,
        # capped, or not yet started) are skipped in-program and
        # unbilled
        stepper.run_steps(B, n_actives=n_actives)
        fleet_time += stepper.last_bundle_dt / max(
            cfgs[0].frac_time_perception, 1e-9)
        for i in range(K):
            t_steps[i] += n_actives[i]
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
        "compiled_shapes": sorted(stepper._compiled),
    } for i in range(K)]
