import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.ops import embedding as emb
from isdf_tpu.models import sdf_mlp as M


def manual_pe(x, scale, min_deg, max_deg):
    """Independent numpy recomputation of the icosahedron PE formula."""
    nf = max_deg - min_deg + 1
    bands = 2.0 ** np.linspace(min_deg, max_deg, nf)
    xs = x * scale
    proj = xs @ emb.ICOSAHEDRON_DIRS.T                       # [N, 21]
    xb = (proj[..., None] * bands).reshape(len(x), -1)       # [N, 21*nf]
    e = np.sin(np.concatenate([xb, xb + 0.5 * np.pi], axis=-1))
    return np.concatenate([xs, e], axis=-1)


def test_pe_matches_manual_and_size():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 3)).astype(np.float32)
    got = np.asarray(emb.positional_encoding(
        jnp.asarray(x), scale=0.0594, min_deg=0, max_deg=5))
    want = manual_pe(x, 0.0594, 0, 5)
    assert got.shape == (17, 2 * 21 * 6 + 3)
    assert got.shape[-1] == emb.embedding_size(0, 5) == 255
    assert np.allclose(got, want, atol=1e-5)


def test_pe_transform_applied_before_scale():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, 2.0, 3.0]
    x = np.zeros((1, 3), np.float32)
    got = np.asarray(emb.positional_encoding(
        jnp.asarray(x), transform=jnp.asarray(T), scale=0.1))
    # first 3 entries are the transformed+scaled coords
    assert np.allclose(got[0, :3], [0.1, 0.2, 0.3], atol=1e-6)


def test_dirs_are_unit():
    assert np.allclose(np.linalg.norm(emb.ICOSAHEDRON_DIRS, axis=1), 1.0,
                       atol=1e-6)


def test_gaussian_encoding_shapes():
    key = jax.random.PRNGKey(0)
    B = emb.init_gaussian_embedding(key, std=5.0, n_feats=126)
    x = jnp.zeros((4, 3))
    e = emb.gaussian_encoding(x, B, scale=0.1)
    assert e.shape == (4, 3 + 2 * 126)
    # at x=0: sin=0, cos=1
    assert np.allclose(np.asarray(e[:, 3:3 + 126]), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(e[:, 3 + 126:]), 1.0, atol=1e-6)


def _model():
    return M.SDFModel(embedding_size=255, hidden_size=64,
                      hidden_layers_block=1, scale_output=0.14,
                      scale_input=0.0594)


def test_mlp_shapes_and_determinism():
    model = _model()
    params = M.init_params(jax.random.PRNGKey(0), model)
    x = jax.random.normal(jax.random.PRNGKey(1), (33, 3))
    y1 = M.apply(params, x, model)
    y2 = M.apply(params, x, model)
    assert y1.shape == (33,)
    assert np.allclose(y1, y2)
    # batch/point consistency: same point in a different batch, same value
    y_single = M.apply(params, x[:1], model)
    assert np.allclose(y_single[0], y1[0], atol=1e-6)


def test_mlp_param_count_matches_reference_architecture():
    # reference default: 255 -> 256 -> 2x256 -> cat(256+255)->256 -> 2x256 -> 1
    model = M.SDFModel(embedding_size=255, hidden_size=256,
                       hidden_layers_block=2)
    params = M.init_params(jax.random.PRNGKey(0), model)
    expect = ((255 * 256 + 256) + 2 * (256 * 256 + 256)
              + ((256 + 255) * 256 + 256) + 2 * (256 * 256 + 256)
              + (256 * 1 + 1))
    assert M.param_count(params) == expect


def test_softplus_beta100_matches_definition():
    x = np.linspace(-0.3, 0.3, 101).astype(np.float32)
    got = np.asarray(M.softplus_b100(jnp.asarray(x)))
    want = np.log1p(np.exp(100.0 * x.astype(np.float64))) / 100.0
    # large-x branch: log1p(exp(y))/100 -> x
    want = np.where(100 * x > 30, x, want)
    assert np.allclose(got, want, atol=1e-6)


def test_sdf_and_grad_matches_finite_difference():
    model = _model()
    params = M.init_params(jax.random.PRNGKey(0), model)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 3)) * 0.5
    sdf, grad = M.sdf_and_grad(params, x, model)
    assert sdf.shape == (5,) and grad.shape == (5, 3)
    eps = 1e-3
    for d in range(3):
        dx = jnp.zeros((5, 3)).at[:, d].set(eps)
        fd = (M.apply(params, x + dx, model)
              - M.apply(params, x - dx, model)) / (2 * eps)
        assert np.allclose(np.asarray(grad[:, d]), np.asarray(fd), atol=5e-3)


def test_grad_of_grad_is_finite():
    # eikonal double-backward path: d/dparams of ||grad||
    model = _model()
    params = M.init_params(jax.random.PRNGKey(0), model)
    x = jax.random.normal(jax.random.PRNGKey(3), (7, 3))

    def loss(p):
        _, g = M.sdf_and_grad(p, x, model)
        return jnp.abs(jnp.linalg.norm(g, axis=-1) - 1.0).mean()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_noise_applied_before_output_scale():
    model = _model()
    params = M.init_params(jax.random.PRNGKey(0), model)
    x = jnp.zeros((1000, 3))
    key = jax.random.PRNGKey(4)
    noisy = M.apply_with_noise(params, x, model, key, 1.0)
    clean = M.apply(params, x, model)
    resid = np.asarray(noisy - clean)
    # std of residual = noise_std * scale_output
    assert abs(resid.std() - model.scale_output) < 0.02
