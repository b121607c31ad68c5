"""Pruned blocks + pruning utilities + general helpers."""
import jax
import jax.numpy as jnp
import numpy as np

from leadyolo_tpu.models.pruned import (
    BottleneckPruned,
    C3Pruned,
    SPPFPruned,
    bn_channel_masks,
    bn_prune_threshold,
    gather_bn_weights,
    l1_unstructured_prune,
    sparsity,
)
from leadyolo_tpu.utils.general import check_img_size, increment_path, one_cycle


def test_pruned_blocks_forward(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16), dtype=np.float32))
    for mod, c_out in [
        (BottleneckPruned(10, 16), 16),
        (C3Pruned(6, 6, 20, inner=((4, 6),)), 20),
        (SPPFPruned(5, 24), 24),
    ]:
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape[-1] == c_out


def test_bn_gamma_analysis():
    mod = BottleneckPruned(10, 16)
    x = jnp.zeros((1, 8, 8, 16))
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    w = gather_bn_weights(v)
    assert len(w) == 10 + 16  # cv1 + cv2 BN scales
    thr = bn_prune_threshold(v, 0.5)
    masks = bn_channel_masks(v, thr)
    assert sum(m.sum() for m in masks.values()) <= len(w)


def test_l1_prune_sparsity(rng):
    params = {"conv": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 16), dtype=np.float32))}}
    pruned = l1_unstructured_prune(params, amount=0.3)
    s = sparsity(pruned)
    assert 0.25 < s < 0.35


def test_increment_path(tmp_path):
    p = tmp_path / "exp"
    p.mkdir()
    p2 = increment_path(p)
    assert p2.name == "exp2"


def test_check_img_size():
    assert check_img_size(640, 32) == 640
    assert check_img_size(641, 32) == 672


def test_one_cycle():
    f = one_cycle(1.0, 0.1, 100)
    assert abs(f(0) - 1.0) < 1e-9 and abs(f(100) - 0.1) < 1e-9
