"""LazyConcat: deferred channel concat with split-kernel convs.

conv(cat(a, b)) must equal conv_a(a) + conv_b(b) exactly (up to float
summation order); the graph executor must materialize for consumers that
cannot split. See nn/functional.LazyConcat.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leadyolo_tpu.nn import functional as F
from leadyolo_tpu.nn.functional import LazyConcat, lazy_cat
from leadyolo_tpu.nn.layers import Conv, Conv2d


@pytest.mark.parametrize("k,s,use_bias", [(1, 1, False), (3, 1, True), (3, 2, True)])
def test_conv2d_split_matches_dense(k, s, use_bias):
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 24))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 40))
    m = Conv2d(32, k, s, use_bias=use_bias)
    dense_in = jnp.concatenate([a, b], axis=-1)
    v = m.init(jax.random.PRNGKey(2), dense_in)
    ref = m.apply(v, dense_in)
    out = m.apply(v, lazy_cat([a, b]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_grouped_conv_materializes():
    a = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    m = Conv2d(32, 3, 1, g=2)
    dense_in = jnp.concatenate([a, b], axis=-1)
    v = m.init(jax.random.PRNGKey(2), dense_in)
    ref = m.apply(v, dense_in)
    out = m.apply(v, lazy_cat([a, b]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_lazy_concat_flattens_and_shapes():
    a = jnp.zeros((1, 4, 4, 3))
    b = jnp.zeros((1, 4, 4, 5))
    c = jnp.zeros((1, 4, 4, 2))
    lc = lazy_cat([lazy_cat([a, b]), c])
    assert len(lc.parts) == 3
    assert lc.shape == (1, 4, 4, 10)
    assert lc.materialize().shape == (1, 4, 4, 10)


def test_full_model_lazy_matches_dense():
    """The whole lead-yolo graph with deferred concats must reproduce the
    dense-concat formulation (fp32, CPU) to float-reassociation tolerance."""
    from leadyolo_tpu.models.yolo import DetectionModel

    model = DetectionModel("lead-yolo")
    v = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3), jnp.float32)
    out_lazy = model.apply(v, x, train=False, decode=True)

    # force dense concats everywhere lazy_cat is referenced
    import leadyolo_tpu.nn.attention as attention_mod
    import leadyolo_tpu.nn.layers as layers_mod

    dense = lambda xs: jnp.concatenate(xs, axis=-1)
    saved = (layers_mod.lazy_cat, attention_mod.lazy_cat, F.lazy_cat)
    layers_mod.lazy_cat = attention_mod.lazy_cat = F.lazy_cat = dense
    try:
        out_dense = model.apply(v, x, train=False, decode=True)
    finally:
        layers_mod.lazy_cat, attention_mod.lazy_cat, F.lazy_cat = saved

    np.testing.assert_allclose(
        np.asarray(out_lazy, np.float32), np.asarray(out_dense, np.float32),
        rtol=1e-4, atol=1e-5,
    )


def test_train_mode_gradients_flow():
    from leadyolo_tpu.nn.attention import C3_CA

    m = C3_CA(c2=32, n=1)
    a = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(2), lazy_cat([a, b]))

    def loss(p):
        y, _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            lazy_cat([a, b]), train=True, mutable=["batch_stats"],
        )
        return jnp.sum(y**2)

    from jax.flatten_util import ravel_pytree

    g = jax.grad(loss)(v["params"])
    flat = ravel_pytree(g)[0]
    assert jnp.isfinite(flat).all() and float(jnp.abs(flat).sum()) > 0
