"""Fused Pallas gated tap-contraction vs the XLA reference path.

The kernel (nn/pallas_gated_contract.py) must be numerically interchangeable
with the XLA formulation it replaces at inference (same parameter tree,
bf16-level tolerance) — mAP-invariance on trained weights rides on this.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leadyolo_tpu.nn.rfa import RFCBAMConv
from leadyolo_tpu.utils import set_fused_kernels

INTERP = jax.default_backend() != "tpu"


def _init_with_stats(m, x):
    v = m.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so the fp32 folding is actually exercised
    bs = jax.tree.map(
        lambda t: t + 0.05 * jax.random.normal(jax.random.PRNGKey(2), t.shape) ** 2,
        v["batch_stats"],
    )
    return {"params": v["params"], "batch_stats": bs}


def _xla_ref(m, v, x):
    set_fused_kernels(False)
    try:
        return m.apply(v, x, train=False)
    finally:
        set_fused_kernels(None)


def _fused(m, v, x):
    set_fused_kernels(True)
    try:
        return m.apply(v, x, train=False)
    finally:
        set_fused_kernels(None)


# the four LEAD-YOLO head RFCBAM configurations at toy spatial scale:
# k=1 s=1 (layers 9/13) and k=3 s=2 (layers 17/20), plus k=3 s=1 coverage
@pytest.mark.parametrize(
    "shape,c2,k,s",
    [
        ((2, 16, 16, 32), 64, 3, 2),
        ((1, 8, 8, 16), 16, 3, 2),
        ((2, 8, 8, 32), 32, 3, 1),
        ((2, 8, 8, 32), 16, 1, 1),
    ],
)
def test_fused_matches_xla(shape, c2, k, s):
    m = RFCBAMConv(c2=c2, k=k, s=s)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    v = _init_with_stats(m, x)
    ref = _xla_ref(m, v, x)
    out = _fused(m, v, x)
    assert out.shape == ref.shape == (shape[0], shape[1] // s, shape[2] // s, c2)
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )
    assert np.quantile(diff, 0.99) < 0.03  # bf16-tight on the bulk of elements


def test_multi_row_block_matches_reference():
    """Row-tiled grids (the VMEM-fit path for large maps) must agree with a
    dense fp32 reference of relu(bn(gated @ W + bias)) at every tiling."""
    from leadyolo_tpu.nn.pallas_gated_contract import gated_tap_contract

    b, h, w, c, t, c_out = 2, 8, 8, 32, 9, 48
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    feat = jax.random.normal(ks[0], (b, h, w, c, t), jnp.bfloat16)
    rf = jax.nn.sigmoid(jax.random.normal(ks[1], (b, h, w, 1, t)))
    ch = jax.nn.sigmoid(jax.random.normal(ks[2], (b, 1, 1, c)))
    wgt = jax.random.normal(ks[3], (t, c, c_out)) * 0.1
    bias = jax.random.normal(ks[4], (c_out,)) * 0.1
    bn_scale = 1.0 + 0.1 * jax.random.normal(ks[5], (c_out,))
    bn_bias = 0.1 * jax.random.normal(ks[6], (c_out,))
    bn_mean = 0.1 * jax.random.normal(ks[7], (c_out,))
    bn_var = jnp.abs(1.0 + 0.1 * jax.random.normal(ks[5], (c_out,)))

    gated = feat.astype(jnp.float32) * ch[..., None] * rf
    dense = jnp.einsum("bhwct,tco->bhwo", gated, wgt)
    inv = jax.lax.rsqrt(bn_var + 1e-3) * bn_scale
    ref = np.asarray(jnp.maximum((dense + bias - bn_mean) * inv + bn_bias, 0.0), np.float32)

    for bm in (64, 32, 16, 8):
        out = gated_tap_contract(
            feat, rf, ch, wgt, bias, bn_scale, bn_bias, bn_mean, bn_var,
            interpret=INTERP, block_rows=bm,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), ref, rtol=0.05, atol=0.05,
            err_msg=f"block_rows={bm}",
        )


def test_pick_row_block_divides_and_fits():
    from leadyolo_tpu.nn.pallas_gated_contract import pick_row_block, supports

    # the four LEAD-YOLO head layers at 640px/batch-128 tap-map shapes
    assert supports((128, 40, 40, 128, 9), 128)  # layer 17 (post-stride-2)
    assert supports((128, 20, 20, 128, 9), 256)  # layer 20
    assert supports((128, 40, 40, 256, 1), 128)  # layer 13 (k=1)
    assert supports((128, 20, 20, 256, 1), 256)  # layer 9 (k=1)
    bm = pick_row_block(1600, 1152, 128)
    assert bm is not None and 1600 % bm == 0 and bm % 8 == 0
    # a map whose row count has no multiple-of-8 divisor is not supported
    assert pick_row_block(9, 1152, 128) is None


def test_gradients_use_xla_path():
    """train=True must never dispatch to the kernel (no custom VJP)."""
    m = RFCBAMConv(c2=16, k=3, s=2)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 16), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    set_fused_kernels(True)
    try:
        def loss(p):
            y, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        g = jax.grad(loss)(v["params"])
    finally:
        set_fused_kernels(None)
    from jax.flatten_util import ravel_pytree

    assert jnp.isfinite(ravel_pytree(g)[0]).all()
