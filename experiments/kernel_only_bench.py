import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from isdf_tpu.models import sdf_mlp as M
from isdf_tpu.models.pallas_mlp import make_pallas_train_op
from isdf_tpu.utils.config import Config

cfg = Config().replace(bounds_method="pc")
model = M.SDFModel(embedding_size=cfg.embedding_size,
                   hidden_size=cfg.hidden_feature_size,
                   hidden_layers_block=cfg.hidden_layers_block,
                   max_deg=cfg.n_embed_funcs,
                   scale_input=cfg.scale_input,
                   scale_output=cfg.scale_output,
                   mm_precision=cfg.mm_precision)
params = M.init_params(jax.random.PRNGKey(0), model)
op = make_pallas_train_op(
    model, cfg.hidden_layers_block, loss_type=cfg.loss_type,
    trunc_distance=cfg.trunc_distance, trunc_weight=cfg.trunc_weight,
    eik_apply_dist=cfg.eik_apply_dist, eik_weight=cfg.eik_weight,
    grad_weight=cfg.grad_weight, orien_loss=cfg.orien_loss,
    pe_in_kernel=True, pc_bounds=True)

R = cfg.window_size * cfg.n_rays           # 1000 rays
S = cfg.n_samples_per_ray                  # 27
N = R * S
key = jax.random.PRNGKey(1)
pts = jax.random.uniform(key, (N, 3), minval=-2.0, maxval=2.0)
surf = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0)
surf_valid = jnp.ones((R,))
zd = jax.random.uniform(key, (N,), minval=-0.5, maxval=0.5)
normals_pt = jnp.zeros((N, 3)).at[:, 1].set(1.0)
is_surf = jnp.zeros((N,)).at[::S].set(1.0)
valid = jnp.ones((N,))
noise = jnp.zeros((N,))
transform = jnp.eye(4)

BUNDLE = 600
@jax.jit
def bundle(params, pts):
    def body(c, _):
        sums, ploss, grads = op(params, transform, pts, surf, surf_valid,
                                zd, normals_pt, is_surf, valid, noise,
                                jnp.float32(1.0 / N))
        # consume grads so nothing is DCE'd; fold into carry
        s = sums[0] + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return c + s, ()
    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=BUNDLE)
    return out

v = float(np.asarray(bundle(params, pts)))  # warm + fetch
walls = []
for _ in range(6):
    t0 = time.perf_counter()
    v = float(np.asarray(bundle(params, pts)))
    walls.append(time.perf_counter() - t0)
w = min(walls)
print("kernel-only: %.3f ms/step (600-step bundle, min of 6)" % (w / BUNDLE * 1e3))
