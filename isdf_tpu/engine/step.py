"""The jitted training engine: one fused step, scanned bundles, keyframe ops.

Reference hot loop: isdf/modules/trainer.py:951-1016 (step) with
keyframe-window selection at :652-674 and the loss assembly at :768-868.
There, every step crosses host<->device several times (numpy RNG keyframe
choice, .item() loss logging, CUDA event sync). Here the WHOLE inner loop —
window selection, pixel/ray sampling, forward, spatial grads, bounds,
losses, AdamW and the replay-priority writeback — is one jitted function
with donated buffers, and multi-step bundles run under lax.scan so the host
only intervenes at frame boundaries.

Keyframe-window selection on device: the reference draws window_size-2
older keyframes without replacement with probability proportional to their
running average losses (np.random.choice). Gumbel-top-k over log-losses is
exactly that distribution (Plackett-Luce), and is branchless.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from isdf_tpu.engine.buffer import FrameBuffer
from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.ops import bounds as B
from isdf_tpu.ops import losses as L
from isdf_tpu.ops import render as R
from isdf_tpu.ops import sampling as S
from isdf_tpu.utils.config import Config


class StepFunctions(NamedTuple):
    """Jitted engine entry points. ``dirs`` is the per-pixel ray-direction
    image — passed explicitly (NOT closed over) so the 9.8 MB array is a
    runtime operand instead of an HLO constant (the axon remote-compile
    path ships the full HLO blob)."""
    train_bundle: Callable   # (params, opt, buf, dirs, transform, key,
    #   noise_std, n_steps) -> (params, opt, buf, scalars [n_steps])
    is_keyframe: Callable    # (params, depth, T_WC, dirs, transform, key,
    #   noise_std) -> (bool, below_th_prop)
    eval_sdf: Callable       # (params, pts [N,3], transform) -> sdf [N]
    eval_sdf_grad: Callable  # (params, pts [N,3], transform) -> grad [N,3]
    eval_sdf_batched: Callable       # (params, [C,K,3], tr) -> [C,K]
    eval_sdf_grad_batched: Callable  # (params, [C,K,3], tr) -> [C,K,3]
    render_depth: Callable   # (params, T_WC, dirs_C, gt_depth, transform,
    #   key, n_strat) -> depth [F,N]
    dirs: Any                # [H, W, 3] device array to pass as ``dirs``
    optimiser: Any
    uses_pallas_kernel: bool = False  # monolithic Mosaic train kernel on
    train_bundle_raw: Any = None  # the UNJITTED bundle body — larger jitted
    #   programs (the multi-scene joint bundle, parallel/multi_scene.py)
    #   inline it instead of nesting a pjit call with dead donation hints
    compiler_options: Any = None  # compiler options the bundle needs
    #   (pallas scoped-VMEM cap); joint programs must carry them too


def select_window(key, count, frame_avg_loss, window_size: int,
                  tail=False):
    """Pick the active keyframe window (reference trainer.py:652-674).

    Always the two newest frames; the remaining window_size-2 drawn without
    replacement from the older frames with p proportional to their average
    loss (Gumbel-top-k). When <= window_size frames exist, the window is
    all frames (+ masked padding).

    ``tail`` (traced bool): refinement-tail mode — ingestion is over, so
    "the two newest frames" loses its meaning; the whole window is drawn
    loss-proportionally from ALL keyframes instead (documented divergence:
    the reference keeps forcing the newest two during its end-of-sequence
    extra steps, which over-trains the last-seen region).

    Returns (idxs [window_size] int32, valid [window_size] bool).
    """
    C = frame_avg_loss.shape[0]
    k = window_size - 2

    def small(_):
        idxs = jnp.arange(window_size, dtype=jnp.int32)
        return idxs, idxs < count

    def big(key):
        def stream(key):
            limit = count - 2          # older pool is [0, limit)
            logits = jnp.log(jnp.maximum(frame_avg_loss, 1e-30))
            logits = jnp.where(jnp.arange(C) < limit, logits, -jnp.inf)
            g = jax.random.gumbel(key, (C,))
            _, top = jax.lax.top_k(logits + g, k)
            idxs = jnp.concatenate(
                [top.astype(jnp.int32),
                 jnp.stack([count - 2, count - 1]).astype(jnp.int32)])
            return idxs, jnp.ones((window_size,), bool)

        def tail_sel(key):
            logits = jnp.log(jnp.maximum(frame_avg_loss, 1e-30))
            logits = jnp.where(jnp.arange(C) < count, logits, -jnp.inf)
            g = jax.random.gumbel(key, (C,))
            # this branch only runs when count > window_size, but cond
            # traces it even when the arena capacity C < window_size
            kk = min(window_size, C)
            _, top = jax.lax.top_k(logits + g, kk)
            top = jnp.concatenate(
                [top, jnp.zeros((window_size - kk,), top.dtype)])
            return top.astype(jnp.int32), jnp.ones((window_size,), bool)

        return jax.lax.cond(tail, tail_sel, stream, key)

    return jax.lax.cond(count > window_size, big, small, key)


def build_step_functions(config: Config, model: M.SDFModel,
                         H: int, W: int, dirs_C_img,
                         mesh=None) -> StepFunctions:
    """Compile-time specialisation of the engine to a config + camera.

    mesh: optional jax.sharding.Mesh with a "dp" axis — rays are sharded
    across it (params/buffer replicated); see isdf_tpu/parallel/mesh.py.
    """
    cfg = config
    n_rays, Wn = cfg.n_rays, cfg.window_size
    do_normal = cfg.do_normal
    do_sdf_grad = cfg.eik_weight != 0 or cfg.grad_weight != 0
    if mesh is not None:
        from isdf_tpu.parallel.mesh import replicated
        dirs_dev = jax.device_put(jnp.asarray(dirs_C_img),
                                  replicated(mesh))
    else:
        dirs_dev = jax.device_put(jnp.asarray(dirs_C_img))
    pallas_mode = ("tpu" if (cfg.use_pallas
                             and jax.default_backend() == "tpu") else None)

    # monolithic fused loss+grad kernel (models/pallas_mlp.py): forward,
    # spatial gradient, per-point loss and the full parameter VJP in ONE
    # sequential-grid Mosaic kernel — no autodiff crosses the MLP.
    # Data-parallel meshes: GSPMD cannot shard a custom-call, so the
    # kernel is wrapped in shard_map below — each chip runs it on its ray
    # shard and psums the gradients/scalar sums over ICI (requires
    # pe_in_kernel; otherwise dp meshes fall back to the XLA path).
    train_op = None
    if (cfg.grad_mode == "pallas"
            and (mesh is None or cfg.pe_in_kernel)
            and (jax.default_backend() == "tpu" or cfg.pallas_interpret)
            and model.hidden_size == 256 and not model.gauss_embed
            and do_sdf_grad):
        from isdf_tpu.models.pallas_mlp import make_pallas_train_op
        pc_in_kernel = (cfg.pc_in_kernel and cfg.pe_in_kernel
                        and cfg.bounds_method == "pc")
        train_op = make_pallas_train_op(
            model, cfg.hidden_layers_block, loss_type=cfg.loss_type,
            trunc_distance=cfg.trunc_distance,
            trunc_weight=cfg.trunc_weight,
            eik_apply_dist=cfg.eik_apply_dist, eik_weight=cfg.eik_weight,
            grad_weight=cfg.grad_weight, orien_loss=cfg.orien_loss,
            interpret=cfg.pallas_interpret,
            force_f32=cfg.pallas_interpret,
            pe_in_kernel=cfg.pe_in_kernel,
            pc_bounds=pc_in_kernel,
            packed_io=True)

    optimiser = optax.adamw(
        learning_rate=cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay)
    from isdf_tpu.models.fused_adamw import make_fused_adamw
    fused_update = make_fused_adamw(cfg.lr, cfg.weight_decay,
                                    b1=0.9, b2=0.999, eps=1e-8)
    if train_op is not None:
        # the pallas path trains directly on the PACKED parameter planes
        # (kernel-operand layout): the optimiser state lives on
        # (Wp [L,512,256], bpt [8,L*256]) and the per-step pack/unpack
        # glue (~62 us/step measured round 3) leaves the scanned hot
        # loop — train_bundle packs once per bundle and unpacks once at
        # exit, so the external params contract stays the layer pytree.
        # Elementwise AdamW on the packed planes is exactly AdamW on the
        # pytree: real entries map 1:1 and padded entries have provably
        # zero gradient (models/pallas_mlp.py pack_params_train).
        from isdf_tpu.models.pallas_mlp import (pack_params_train,
                                                unpack_params_train)
        _base_opt = optimiser
        optimiser = optax.GradientTransformation(
            init=lambda p: _base_opt.init(pack_params_train(p)),
            update=_base_opt.update)

    # ---------------- loss over one ray batch ----------------
    def _ray_batch_loss(params, transform, key_noise, noise_std, pc,
                        z_vals, dirs_C, dirs_W, depth, normals, valid):
        # forward + one VJP for spatial grads, rematerialised: the step is
        # HBM-bound on activation traffic, so recomputing the MLP in the
        # outer backward (jax.checkpoint) is cheaper than storing six
        # 27k x 256 activation tensors per pass. (A fused forward-mode
        # variant exists — sdf_and_grad_fused — but measured slower: the
        # stacked tangent chain quadruples activation traffic.)
        def _value_and_spatial_grad(p, xp):
            if (cfg.grad_mode in ("reverse_fused", "pallas")
                    and do_sdf_grad and not model.gauss_embed):
                # the factored PE tangents are derived for the icosahedron
                # encoder; gauss_embed falls through to autodiff below
                # hand-derived custom VJP (models/fused_vjp.py): reverse
                # v-chain primal + single-combined-tangent backward
                from isdf_tpu.models.fused_vjp import make_reverse_fused_mlp
                from isdf_tpu.models.sdf_mlp import _pe_factored
                R_, S_, _ = xp.shape
                flat = xp.reshape(R_ * S_, 3)
                pe, cos_b, dxs, dproj2 = _pe_factored(flat, model, transform)
                if (cfg.grad_mode == "pallas"
                        and jax.default_backend() == "tpu"
                        and model.hidden_size == 256):
                    from isdf_tpu.models.pallas_mlp import \
                        make_pallas_reverse_fused
                    op = make_pallas_reverse_fused(
                        model, cfg.hidden_layers_block)
                else:
                    op = make_reverse_fused_mlp(model,
                                                cfg.hidden_layers_block)
                raw, graw = op(p, pe, cos_b, dxs, dproj2)
                return (raw.reshape(R_, S_) * model.scale_output,
                        graw.reshape(R_, S_, 3) * model.scale_output)
            sdf = M.apply(p, xp, model, transform=transform)
            if not do_sdf_grad:
                return sdf, jnp.zeros_like(xp)
            g = jax.grad(
                lambda xq: M.apply(p, xq, model,
                                   transform=transform).sum())(xp)
            return sdf, g

        if cfg.remat:
            _value_and_spatial_grad = jax.checkpoint(_value_and_spatial_grad)
        sdf, sdf_grad = _value_and_spatial_grad(params, pc)
        if not do_sdf_grad:
            sdf_grad = None
        noise = jax.random.normal(key_noise, sdf.shape, sdf.dtype) * noise_std
        sdf = sdf + noise * model.scale_output

        surf_b = sv_b = None
        if cfg.bounds_method == "pc":
            surf_b, sv_b = _surf_set(key_noise, pc, valid)
        bnd = B.compute_bounds(
            cfg.bounds_method, dirs_C, depth, dirs_W, z_vals, pc,
            cfg.trunc_distance, normals, valid,
            do_grad=cfg.grad_weight != 0, pallas_mode=pallas_mode,
            surf=surf_b, surf_valid=sv_b)

        sdf_mat, free_space = L.sdf_loss(
            sdf, bnd.bounds, cfg.trunc_distance, cfg.loss_type)

        eik_mat = None
        if cfg.eik_weight != 0:
            eik_mat = jnp.abs(
                jnp.linalg.norm(sdf_grad, axis=-1) - 1.0)

        grad_mat = None
        if cfg.grad_weight != 0:
            grad_mat = L.grad_cosine_loss(
                sdf_grad, bnd.grad, bnd.grad_valid, normals, cfg.orien_loss)

        out = L.tot_loss(
            sdf_mat, grad_mat, eik_mat, free_space, bnd.bounds, valid,
            cfg.eik_apply_dist, cfg.trunc_weight, cfg.grad_weight,
            cfg.eik_weight)
        return out

    def _surf_set(k, pc, valid):
        """Surface set for batch-distance (pc) bounds, capped at
        cfg.pc_surf_budget points. The [N, R_surf] score matrix is the
        step's only quadratically-scaling term (experiments/
        scaling_probe.py: pc section 0.08 -> 1.08 ms from 1x to 4x rays
        while the MLP kernel stays flat); a valid-first random subsample
        keeps its cost linear in the ray count with the bound quality of
        the reference's shipped 1000-point surface set. Budget >= R
        (every shipped config at 1x rays) takes this Python-level branch
        away entirely: exact full set, untouched RNG stream."""
        surf = pc[:, 0]
        R_ = surf.shape[0]
        B = cfg.pc_surf_budget
        if not B or B >= R_:
            return surf, valid
        score = (valid.astype(jnp.float32) * 2.0
                 + jax.random.uniform(jax.random.fold_in(k, 7), (R_,)))
        sel = jax.lax.top_k(score, B)[1]
        return surf[sel], valid[sel]

    # ---------------- fused loss+grad via the monolithic kernel --------
    def _shard_mapped(op, sharded_ix, *args):
        """Run ``op`` under shard_map: args at positions in sharded_ix
        split over "dp", the rest are replicated. Each chip runs the
        kernel on its contiguous ray shard (rays % dp == 0 is enforced at
        Trainer init, so shard boundaries fall between rays); gradient +
        scalar-sum reduction rides ICI."""
        from jax.sharding import PartitionSpec as PS

        def local(*a):
            s, pls, g = op(*a)
            s = jax.lax.psum(s, "dp")
            g = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, "dp"), g)
            return s, pls, g

        specs = tuple(PS("dp") if i in sharded_ix else PS()
                      for i in range(len(args)))
        return jax.shard_map(
            local, mesh=mesh, in_specs=specs,
            out_specs=(PS(), PS("dp"), PS()),
            # pallas out_shapes carry no vma annotation
            check_vma=False)(*args)

    def _pallas_loss_and_grad(params, transform, k_noise, noise_std, pc,
                              z_vals, dirs_C, dirs_W, depth, normals,
                              valid):
        R_, S_, _ = pc.shape
        N = R_ * S_
        flat = pc.reshape(N, 3)
        noise = jax.random.normal(k_noise, (N,)) * noise_std
        vflat = jnp.broadcast_to(valid[:, None], (R_, S_)).reshape(-1)
        C = S_ * valid.sum()
        invC = jnp.where(C > 0, 1.0 / jnp.maximum(C, 1), 0.0)

        if pc_in_kernel:
            # batch-distance bounds + grad targets computed IN-KERNEL:
            # no [N,R] score matrix, no gt assembly (models/pallas_mlp.py);
            # surface set capped at pc_surf_budget (see _surf_set)
            surf, sv = _surf_set(k_noise, pc, valid)
            zd = (z_vals - depth[:, None]).reshape(-1)
            normals_pt = jnp.broadcast_to(
                normals[:, None, :], (R_, S_, 3)).reshape(N, 3)
            is_surf = jnp.zeros((R_, S_)).at[:, 0].set(1.0).reshape(-1)
            args = (params, transform, flat, surf,
                    sv.astype(jnp.float32), zd, normals_pt, is_surf,
                    vflat.astype(jnp.float32), noise, invC)
            if mesh is None:
                sums, ploss, grads = train_op(*args)
            else:
                # surf/surf_valid replicated (the batch-distance set is
                # global); GSPMD all-gathers them before the shard_map
                sums, ploss, grads = _shard_mapped(
                    train_op, {2, 5, 6, 7, 8, 9}, *args)
        else:
            if not cfg.pe_in_kernel:
                from isdf_tpu.models.sdf_mlp import _pe_factored
                pe, _, dxs, dproj2 = _pe_factored(flat, model, transform)

            surf_b = sv_b = None
            if cfg.bounds_method == "pc":
                surf_b, sv_b = _surf_set(k_noise, pc, valid)
            bnd = B.compute_bounds(
                cfg.bounds_method, dirs_C, depth, dirs_W, z_vals, pc,
                cfg.trunc_distance, normals, valid,
                do_grad=cfg.grad_weight != 0, pallas_mode=pallas_mode,
                surf=surf_b, surf_valid=sv_b)

            if cfg.grad_weight != 0:
                gv = bnd.grad
                if bnd.grad_valid is not None:
                    gv = jnp.where(bnd.grad_valid[..., None], gv,
                                   normals[:, None, :])
                gt = jnp.concatenate(
                    [jnp.broadcast_to(normals[:, None, :], (R_, 1, 3)),
                     gv], axis=1).reshape(N, 3)
            else:
                gt = jnp.zeros((N, 3), jnp.float32)

            if cfg.pe_in_kernel:
                args = (params, transform, flat, bnd.bounds.reshape(-1),
                        vflat.astype(jnp.float32), noise, gt, invC)
                if mesh is None:
                    sums, ploss, grads = train_op(*args)
                else:
                    sums, ploss, grads = _shard_mapped(
                        train_op, {2, 3, 4, 5, 6}, *args)
            else:
                sums, ploss, grads = train_op(
                    params, pe, dxs, dproj2, bnd.bounds.reshape(-1),
                    vflat.astype(jnp.float32), noise, gt, invC)

        scalars = {"sdf_loss": sums[1] * invC,
                   "total_loss": sums[0] * invC}
        if cfg.grad_weight != 0:
            scalars["grad_loss"] = sums[2] * invC
        if cfg.eik_weight != 0:
            scalars["eikonal_loss"] = sums[3] * invC
        out = L.TotalLoss(total=scalars["total_loss"],
                          mat=ploss.reshape(R_, S_), scalars=scalars)
        return out, grads

    # ---------------- one optimisation step ----------------
    def _core(params, opt_state, buf: FrameBuffer, dirs_C_img, transform,
              key, noise_std, lr_scale, tail):
        k_sel, k_pix, k_ray, k_noise = jax.random.split(key, 4)

        idxs, slot_valid = select_window(
            k_sel, buf.count, buf.frame_avg_loss, Wn, tail=tail)

        if cfg.do_active:
            ib, ih, iw = S.sample_pixels_active(
                k_pix, n_rays, Wn, H, W, buf.loss_approx[idxs],
                cfg.active_frac)
        else:
            ib, ih, iw = S.sample_pixels(k_pix, n_rays, Wn, H, W)
        if mesh is not None:
            from isdf_tpu.parallel.mesh import constrain_rays
            ib, ih, iw = constrain_rays(mesh, ib, ih, iw)
        gi = idxs[ib]

        # gather ONLY the sampled pixels from the arena (never whole frames)
        depth = buf.depth[gi, ih, iw]
        valid = (depth != 0.0) & slot_valid[ib]
        if do_normal:
            normals = buf.normals[gi, ih, iw]
            valid &= ~jnp.isnan(normals[..., 0])
            normals = jnp.nan_to_num(normals)
        else:
            normals = jnp.zeros((depth.shape[0], 3), depth.dtype)
        depth_safe = jnp.where(valid, depth, 1.0)

        dirs_C = dirs_C_img[ih, iw]
        T_WC = buf.T_WC[gi]
        pc, z_vals, _, dirs_W = S.sample_along_rays(
            k_ray, T_WC, dirs_C, depth_safe, cfg.min_depth,
            cfg.dist_behind_surf, cfg.n_strat_samples, cfg.n_surf_samples)
        if mesh is not None:
            from isdf_tpu.parallel.mesh import constrain_rays
            pc, z_vals, valid = constrain_rays(mesh, pc, z_vals, valid)

        if train_op is not None:
            out, grads = _pallas_loss_and_grad(
                params, transform, k_noise, noise_std, pc, z_vals, dirs_C,
                dirs_W, depth_safe, normals, valid)
        else:
            def loss_fn(p):
                o = _ray_batch_loss(
                    p, transform, k_noise, noise_std, pc, z_vals, dirs_C,
                    dirs_W, depth_safe, normals, valid)
                return o.total, o

            (_, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        # hand-fused AdamW (models/fused_adamw.py): optax's update chain
        # costs ~129 us/step on the packed planes inside the scan (its
        # multi-stage tree_map graph defeats fusion); this is the exact
        # same math — incl. the refinement-tail lr_scale, which equals
        # adamw(lr*s) at this step — in one fused elementwise pass, on
        # optax.adamw's own state pytree
        params, opt_state = fused_update(params, grads, opt_state,
                                         lr_scale)

        # replay-priority writeback (reference trainer.py:979):
        # per-frame average loss over an 8x8 block pooling of ray losses
        ray_loss = jax.lax.stop_gradient(out.mat).sum(-1)
        loss_approx, frame_avg = L.frame_avg_loss(
            ray_loss, valid, ib, ih, iw, Wn, H, W, factor=8)
        C = buf.frame_avg_loss.shape[0]
        sums = jnp.zeros((C,)).at[idxs].add(
            jnp.where(slot_valid, frame_avg, 0.0))
        cnts = jnp.zeros((C,)).at[idxs].add(slot_valid.astype(jnp.float32))
        new_losses = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0),
                               buf.frame_avg_loss)
        # persist the block grids for loss-guided active sampling
        la = jnp.where(slot_valid[:, None, None], loss_approx,
                       buf.loss_approx[idxs])
        buf = buf._replace(frame_avg_loss=new_losses,
                           loss_approx=buf.loss_approx.at[idxs].set(la))

        return params, opt_state, buf, out.scalars

    # the pallas grad_mode's kernel outputs get promoted into XLA's
    # scoped VMEM inside the scan body; raise the cap (v5e has far more
    # physical VMEM than the 16 MB default)
    _copts = ({"xla_tpu_scoped_vmem_limit_kib": 65536}
              if (cfg.grad_mode == "pallas"
                  and jax.default_backend() == "tpu") else None)

    @functools.partial(jax.jit, static_argnames=("n_steps",),
                       donate_argnames=("params", "opt_state", "buf"),
                       compiler_options=_copts)
    def train_bundle(params, opt_state, buf, dirs, transform, key,
                     noise_std, n_steps: int = 1, lr_scale=1.0, tail=False,
                     step0=0, n_active=None):
        """``step0``: global index of the bundle's first step (traced).
        Per-step RNG is ``fold_in(key, step0 + t)`` — a pure function of
        the GLOBAL step index, not a per-bundle split, so a trajectory is
        invariant to how the host partitions steps into bundles (solo
        bundles of any size and the fixed-length masked multi-scene joint
        bundles replay identical random streams; parallel/multi_scene.py).

        ``n_active`` (optional traced int32): steps at local index
        t >= n_active are no-ops — state passes through unchanged and
        their scalars are NaN. Lets K scenes with desynced per-scene
        budgets share ONE compiled joint bundle shape. ``None`` (the solo
        default) traces no masking code at all."""
        ts = jnp.arange(n_steps, dtype=jnp.int32)
        template = params
        if train_op is not None:
            # scan on the packed planes (pack once per bundle, not per
            # step); the external contract stays the layer pytree —
            # unpack_params_train reads only template's SHAPES, so
            # donation of ``params`` is unaffected
            params = pack_params_train(params)

        def body(carry, t):
            p, o, b = carry
            k = jax.random.fold_in(key, jnp.int32(step0) + t)
            p2, o2, b2, scalars = _core(p, o, b, dirs, transform, k,
                                        noise_std, lr_scale, tail)
            if n_active is not None:
                # only the leaves _core actually mutates are selected —
                # the arena's big planes (depth/normals/T_WC) pass
                # through untouched on both sides of the select
                m = t < n_active

                def sel(a, b_):
                    return jnp.where(m, a, b_)

                p2 = jax.tree_util.tree_map(sel, p2, p)
                o2 = jax.tree_util.tree_map(sel, o2, o)
                b2 = b2._replace(
                    frame_avg_loss=sel(b2.frame_avg_loss,
                                       b.frame_avg_loss),
                    loss_approx=sel(b2.loss_approx, b.loss_approx))
                scalars = jax.tree_util.tree_map(
                    lambda s: jnp.where(m, s, jnp.nan), scalars)
            return (p2, o2, b2), scalars

        (params, opt_state, buf), scalars = jax.lax.scan(
            body, (params, opt_state, buf), ts)
        if train_op is not None:
            params = unpack_params_train(template, *params)
        return params, opt_state, buf, scalars

    # ---------------- keyframe decision ----------------
    @jax.jit
    def is_keyframe(params, depth_img, T_WC, dirs, transform, key,
                    noise_std):
        """Render the candidate frame through the frozen net and test the
        fraction of rays whose relative depth error is under threshold.
        Reference: trainer.py:586-620 (noise is ON during the check).
        """
        k_pix, k_ray, k_noise = jax.random.split(key, 3)
        ib, ih, iw = S.sample_pixels(k_pix, cfg.n_rays_is_kf, 1, H, W)
        depth = depth_img[ih, iw]
        valid = depth != 0.0
        depth_safe = jnp.where(valid, depth, 1.0)
        dirs_C = dirs[ih, iw]
        T = jnp.broadcast_to(T_WC, (depth.shape[0], 4, 4))
        pc, z_vals, _, _ = S.sample_along_rays(
            k_ray, T, dirs_C, depth_safe, cfg.min_depth,
            0.8,  # reference hard-codes dist_behind_surf=0.8 here
            cfg.n_strat_samples, cfg.n_surf_samples)
        sdf = M.apply_with_noise(params, pc, model, k_noise, noise_std,
                                 transform=transform)
        z_sorted, sdf_sorted = R.sort_by_z(z_vals, sdf)
        view_depth = R.sdf_render_depth(z_sorted, sdf_sorted)
        err = jnp.abs(view_depth - depth_safe) / depth_safe
        below = (err < cfg.kf_dist_th) & valid
        prop = below.sum() / jnp.maximum(valid.sum(), 1)
        return prop < cfg.kf_pixel_ratio, prop

    # ---------------- query/eval paths ----------------
    @jax.jit
    def eval_sdf(params, pts, transform):
        return M.apply(params, pts, model, transform=transform)

    @jax.jit
    def eval_sdf_grad(params, pts, transform):
        _, g = M.sdf_and_grad(params, pts, model, transform=transform)
        return g

    # batched (multi-chunk) variants: ONE dispatch + fetch for an entire
    # grid query instead of a host loop of per-chunk round-trips (the
    # tunnel RTT dominates the 200^3 eval otherwise); lax.map bounds the
    # [chunk, 256] activation footprint like the host loop did
    @jax.jit
    def eval_sdf_batched(params, pts, transform):
        return jax.lax.map(
            lambda p: M.apply(params, p, model, transform=transform), pts)

    @jax.jit
    def eval_sdf_grad_batched(params, pts, transform):
        def one(p):
            _, g = M.sdf_and_grad(params, p, model, transform=transform)
            return g
        return jax.lax.map(one, pts)

    @functools.partial(jax.jit, static_argnames=("n_strat",))
    def render_depth(params, T_WC, dirs_C, gt_depth, transform,
                     key, n_strat: int = 40):
        """Depth render along given rays by dense sampling + sign crossing.
        Used by the visualiser and tests; gt_depth bounds the range like the
        training sampler (surface samples disabled)."""
        F, N, _ = dirs_C.shape
        Tb = jnp.repeat(T_WC, N, axis=0).reshape(F * N, 4, 4)
        db = gt_depth.reshape(F * N)
        pc, z_vals, _, _ = S.sample_along_rays(
            key, Tb, dirs_C.reshape(F * N, 3), db, cfg.min_depth,
            cfg.dist_behind_surf, n_strat, 0)
        sdf = M.apply(params, pc, model, transform=transform)
        z_sorted, sdf_sorted = R.sort_by_z(z_vals, sdf)
        return R.sdf_render_depth(z_sorted, sdf_sorted).reshape(F, N)

    return StepFunctions(
        train_bundle=train_bundle,
        is_keyframe=is_keyframe,
        eval_sdf=eval_sdf,
        eval_sdf_grad=eval_sdf_grad,
        eval_sdf_batched=eval_sdf_batched,
        eval_sdf_grad_batched=eval_sdf_grad_batched,
        render_depth=render_depth,
        dirs=dirs_dev,
        optimiser=optimiser,
        uses_pallas_kernel=train_op is not None,
        train_bundle_raw=train_bundle.__wrapped__,
        compiler_options=_copts,
    )
