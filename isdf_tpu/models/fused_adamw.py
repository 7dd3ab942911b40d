"""Hand-fused AdamW for the scanned train step.

optax.adamw's update chain (scale_by_adam -> add_decayed_weights ->
scale) costs ~129 us/step on the packed parameter planes inside the
600-step bundle (experiments/epilogue_ablation.py) — its tree_map'd
multi-stage graph defeats XLA's fusion, multiplying HBM traffic over
the ~0.93 M parameters. This module computes the SAME math (verified
element-exact in tests/test_fused_adamw.py) as one straight-line
elementwise expression per leaf, which XLA fuses into a single pass:

    m <- b1 m + (1-b1) g          mhat = m / (1 - b1^t)
    v <- b2 v + (1-b2) g^2        vhat = v / (1 - b2^t)
    p <- p - lr_scale * lr * (mhat / (sqrt(vhat) + eps) + wd p)

The optimiser STATE is optax.adamw's own
(ScaleByAdamState(count, mu, nu), EmptyState, EmptyState) — init stays
`optax.adamw(...).init`, so checkpoints and every consumer of
trainer.opt_state are unaffected; this is an execution strategy, not a
new optimiser. lr_scale folds the refinement-tail decay in (scaling the
whole AdamW update by s is exactly adamw(lr*s) at that step, see
engine/step.py).

Capability-matched to the reference's torch.optim.AdamW step
(isdf/modules/trainer.py:435-439,981-986), restructured for XLA fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_fused_adamw(lr: float, weight_decay: float, b1: float = 0.9,
                     b2: float = 0.999, eps: float = 1e-8):
    """Returns apply(params, grads, state, lr_scale) ->
    (new_params, new_state); state is optax.adamw's pytree."""

    def apply(params, grads, state, lr_scale=1.0):
        adam_state = state[0]
        count = optax.safe_int32_increment(adam_state.count)
        t = count.astype(jnp.float32)
        c1 = 1.0 / (1.0 - jnp.power(jnp.float32(b1), t))
        c2 = 1.0 / (1.0 - jnp.power(jnp.float32(b2), t))
        step = lr_scale * lr

        def leaf(p, g, m, v):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            u = (m * c1) / (jnp.sqrt(v * c2) + eps) + weight_decay * p
            return p - step * u, m, v

        out = jax.tree_util.tree_map(leaf, params, grads,
                                     adam_state.mu, adam_state.nu)
        # unzip the (p, m, v) leaf tuples along the params treedef
        treedef = jax.tree_util.tree_structure(params)
        flat = treedef.flatten_up_to(out)
        new_params = treedef.unflatten([f[0] for f in flat])
        new_mu = treedef.unflatten([f[1] for f in flat])
        new_nu = treedef.unflatten([f[2] for f in flat])
        new_state = (adam_state._replace(count=count, mu=new_mu,
                                         nu=new_nu),) + tuple(state[1:])
        return new_params, new_state

    return apply
