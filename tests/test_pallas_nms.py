"""Pallas greedy-NMS kernel vs the XLA formulation and the python oracle
(interpret mode on the CPU mesh)."""
import jax.numpy as jnp
import numpy as np

from leadyolo_tpu.ops.nms import greedy_suppress
from leadyolo_tpu.ops.pallas_nms import greedy_suppress_pallas


def test_pallas_nms_matches_xla(rng):
    for trial in range(3):
        n = 256
        centers = rng.uniform(50, 600, size=(n, 2))
        wh = rng.uniform(10, 80, size=(n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(np.float32)
        scores = np.sort(rng.uniform(0.01, 1.0, n))[::-1].astype(np.float32)
        active = scores > 0.05

        xla = np.asarray(greedy_suppress(jnp.asarray(boxes), jnp.asarray(active), 0.5, tile=128))
        pls = np.asarray(
            greedy_suppress_pallas(jnp.asarray(boxes), jnp.asarray(active), 0.5, tile=128, interpret=True)
        )
        np.testing.assert_array_equal(pls, xla, err_msg=f"trial {trial}")


def test_pallas_nms_inactive_rows(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    boxes = np.pad(boxes, ((0, 125), (0, 0)))
    active = np.zeros(128, bool)
    active[:3] = True
    keep = np.asarray(greedy_suppress_pallas(jnp.asarray(boxes), jnp.asarray(active), 0.45, interpret=True))
    assert keep[0] and not keep[1] and keep[2]
    assert not keep[3:].any()


def test_pallas_nms_deep_chain_exact(rng):
    """Suppression chains deeper than any fixed iteration bound: 100 boxes in
    a line, each overlapping only its neighbor -> greedy keeps alternates.
    The convergence-tested fixpoint must solve this exactly (the old bounded
    16-iteration kernel could not)."""
    n = 128
    boxes = np.stack(
        [np.arange(n) * 6.0, np.zeros(n), np.arange(n) * 6.0 + 10.0, np.full(n, 10.0)], axis=1
    ).astype(np.float32)
    active = np.ones(n, bool)
    keep = np.asarray(
        greedy_suppress_pallas(jnp.asarray(boxes), jnp.asarray(active), 0.2, tile=128, interpret=True)
    )
    expect = np.zeros(n, bool)
    expect[::2] = True
    np.testing.assert_array_equal(keep, expect)
