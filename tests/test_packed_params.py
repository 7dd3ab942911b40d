"""Packed-parameter training invariants (models/pallas_mlp.py).

The pallas train path keeps the optimiser state on the packed kernel
planes (pack_params_train) so no per-step pack/unpack runs inside the
scanned hot loop (engine/step.py). That is only sound if
  (a) pack -> unpack is the exact identity on the real entries,
  (b) the packed-io op returns the same losses and (after slicing) the
      same gradients as the pytree op, and
  (c) every PADDED entry of the packed gradients is exactly zero, so
      elementwise AdamW can never grow the padding away from zero
      (padded pe lanes must stay inert: the forward multiplies them by
      the padded weight rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.fused_vjp import pack_layers
from isdf_tpu.models.pallas_mlp import (CAT, HID, make_pallas_train_op,
                                        pack_params_train,
                                        unpack_params_train)
from isdf_tpu.models.sdf_mlp import _pe_factored


def _setup(seed=2, N=300):
    model = M.SDFModel()
    params = M.init_params(jax.random.PRNGKey(seed), model)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3)) * 1.5
    rng = np.random.default_rng(seed + 2)
    bounds = jnp.asarray(rng.normal(0.1, 0.4, N).astype(np.float32))
    valid = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))
    noise = jnp.asarray(rng.normal(0, 0.03, N).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    invC = jnp.float32(1.0 / max(float(valid.sum()), 1.0))
    kw = dict(loss_type="L1", trunc_distance=0.1, trunc_weight=5.3,
              eik_apply_dist=0.1, eik_weight=0.268, grad_weight=0.018,
              orien_loss=False)
    return model, params, (x, bounds, valid, noise, gt, invC), kw


def _pad_mask(params):
    """(mask_W [L,CAT,HID], mask_b [8,L*HID]) — True on REAL entries."""
    layers = pack_layers(params)
    L = len(layers)
    mW = np.zeros((L, CAT, HID), bool)
    mb = np.zeros((8, L * HID), bool)
    for l, (W, b) in enumerate(layers):
        mW[l, :W.shape[0], :W.shape[1]] = True
        mb[0, l * HID:l * HID + b.shape[0]] = True
    return mW, mb


def test_pack_unpack_roundtrip_exact():
    model, params, _, _ = _setup()
    Wp, bpt = pack_params_train(params)
    back = unpack_params_train(params, Wp, bpt)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # padding of the packed view itself is zero
    mW, mb = _pad_mask(params)
    assert np.all(np.asarray(Wp)[~mW] == 0.0)
    assert np.all(np.asarray(bpt)[~mb] == 0.0)


def test_packed_io_op_matches_pytree_op_and_padding_grads_zero():
    model, params, (x, bounds, valid, noise, gt, invC), kw = _setup()
    import scipy.spatial.transform as st
    R = st.Rotation.from_euler("xyz", [0.3, -0.2, 1.1]).as_matrix()
    T = jnp.asarray(np.block(
        [[R, np.array([[0.4], [-0.2], [0.9]])],
         [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))

    op = make_pallas_train_op(model, 2, **kw, interpret=True,
                              force_f32=True, pe_in_kernel=True)
    op_p = make_pallas_train_op(model, 2, **kw, interpret=True,
                                force_f32=True, pe_in_kernel=True,
                                packed_io=True)
    sums, ploss, g = op(params, T, x, bounds, valid, noise, gt, invC)
    packed = pack_params_train(params)
    sums_p, ploss_p, (dWp, dbp) = op_p(packed, T, x, bounds, valid,
                                       noise, gt, invC)

    np.testing.assert_array_equal(np.asarray(sums_p), np.asarray(sums))
    np.testing.assert_array_equal(np.asarray(ploss_p), np.asarray(ploss))
    # sliced packed grads == pytree grads (exact: same kernel outputs)
    g_from_packed = unpack_params_train(params, dWp, dbp)
    for a, b in zip(jax.tree_util.tree_leaves(g_from_packed),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (c) the load-bearing invariant: padded gradient entries are EXACTLY
    # zero (not just small) — AdamW on the planes must never move padding
    mW, mb = _pad_mask(params)
    assert np.all(np.asarray(dWp)[~mW] == 0.0)
    assert np.all(np.asarray(dbp)[~mb] == 0.0)


def test_adamw_on_packed_planes_equals_pytree_adamw():
    """One AdamW step on (Wp, bpt) == one AdamW step on the pytree,
    entrywise on the real entries, with padding still exactly zero."""
    model, params, _, _ = _setup(seed=5)
    # synthetic grads: real entries random, padding zero (as the kernel
    # guarantees); build them by packing a random params-shaped pytree
    gtree = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(p.size % 97),
                                    p.shape, p.dtype) * 0.1, params)
    gW, gb = pack_params_train(gtree)

    opt = optax.adamw(learning_rate=1.3e-3, b1=0.9, b2=0.999, eps=1e-8,
                      weight_decay=0.012)
    # pytree step
    s0 = opt.init(params)
    up, _ = opt.update(gtree, s0, params)
    p1 = optax.apply_updates(params, up)
    # packed step
    packed = pack_params_train(params)
    sp0 = opt.init(packed)
    upp, _ = opt.update((gW, gb), sp0, packed)
    W1, b1 = optax.apply_updates(packed, upp)

    ref_W, ref_b = pack_params_train(p1)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(ref_W),
                               atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(ref_b),
                               atol=1e-7, rtol=1e-6)
    mW, mb = _pad_mask(params)
    assert np.all(np.asarray(W1)[~mW] == 0.0)
    assert np.all(np.asarray(b1)[~mb] == 0.0)
