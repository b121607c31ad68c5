"""Fused Pallas RFCBAMConv vs the XLA reference path.

The fused kernel must be numerically interchangeable with the XLA
formulation it replaces at inference (same parameter tree, bf16-level
tolerance) — mAP-invariance on trained weights rides on this.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leadyolo_tpu.nn.pallas_rfcbam import rfcbam_fused_infer
from leadyolo_tpu.nn.rfa import RFCBAMConv
from leadyolo_tpu.utils import set_fused_kernels


@pytest.mark.parametrize("shape,c2", [((2, 16, 16, 32), 64), ((1, 8, 12, 16), 16)])
def test_fused_matches_xla(shape, c2):
    m = RFCBAMConv(c2=c2, k=3, s=2)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # make BN stats non-trivial so the folding is actually exercised
    v = jax.tree.map(lambda t: t, v)
    bs = jax.tree.map(
        lambda t: t + 0.05 * jax.random.normal(jax.random.PRNGKey(2), t.shape) ** 2,
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": bs}

    set_fused_kernels(False)
    try:
        ref = m.apply(v, x.astype(jnp.bfloat16), train=False)
    finally:
        set_fused_kernels(None)

    from leadyolo_tpu.nn.attention import SE

    se_gate = SE(16).apply(
        {"params": v["params"]["se"]}, x.astype(jnp.bfloat16), False
    )
    out = rfcbam_fused_infer(
        x.astype(jnp.bfloat16), se_gate, v["params"], v["batch_stats"], c2,
        interpret=jax.default_backend() != "tpu",
    )
    assert out.shape == ref.shape == (shape[0], shape[1] // 2, shape[2] // 2, c2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )
    # bf16-tight on the bulk of elements
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert np.quantile(diff, 0.99) < 0.03


def test_multi_row_block_matches_single():
    """Row-tiled grids (the VMEM-fit path for large images) must agree with
    the single-block kernel and the XLA path — the halo masking at the top
    and bottom image edges is what this exercises."""
    m = RFCBAMConv(c2=32, k=3, s=2)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 12, 32), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    set_fused_kernels(False)
    try:
        ref = m.apply(v, x.astype(jnp.bfloat16), train=False)
    finally:
        set_fused_kernels(None)

    from leadyolo_tpu.nn.attention import SE

    se_gate = SE(16).apply({"params": v["params"]["se"]}, x.astype(jnp.bfloat16), False)
    interp = jax.default_backend() != "tpu"
    for hb in (8, 4, 2, 1):  # nblk = 1, 2, 4, 8
        out = rfcbam_fused_infer(
            x.astype(jnp.bfloat16), se_gate, v["params"], v["batch_stats"], 32,
            interpret=interp, row_block=hb,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05, err_msg=f"row_block={hb}",
        )


def test_pick_row_block_divides_and_fits():
    from leadyolo_tpu.nn.pallas_rfcbam import pick_row_block, supports

    # the two LEAD-YOLO head layers at 640px must be supported
    assert supports((128, 80, 80, 128), 128)
    assert supports((128, 40, 40, 256), 256)
    hb = pick_row_block(40, 40, 128, 128)
    assert hb is not None and 40 % hb == 0
    # odd spatial dims are not
    assert not supports((1, 81, 80, 128), 128)


def test_module_dispatches_to_fused():
    """With the flag forced on, the module's inference path returns the fused
    result (identical to calling the kernel directly)."""
    m = RFCBAMConv(c2=32, k=3, s=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    set_fused_kernels(True)
    try:
        fused = m.apply(v, x, train=False)
    finally:
        set_fused_kernels(None)
    set_fused_kernels(False)
    try:
        ref = m.apply(v, x, train=False)
    finally:
        set_fused_kernels(None)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )
