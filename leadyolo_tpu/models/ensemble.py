"""Model ensembling: NMS-concat of several detectors.

Capability parity with reference models/experimental.py:60-111 (Ensemble +
attempt_load): load N checkpoints (ours or reference .pt), run all, concat
their decoded predictions along the box axis before one shared NMS — the
reference's default 'nms ensemble' mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Ensemble:
    """ens = Ensemble.load(['a.ckpt', 'b.ckpt']); preds = ens(variables-free, images)"""

    def __init__(self, models_and_vars):
        self.members = list(models_and_vars)
        assert self.members, "empty ensemble"
        ncs = {m.nc for m, _ in self.members}
        assert len(ncs) == 1, f"ensembles need matching class counts, got {ncs}"
        self.nc = ncs.pop()
        self.strides = self.members[0][0].strides

    @classmethod
    def load(cls, weights, cfg="lead-yolo", nc=None):
        """attempt_load equivalent (reference models/experimental.py:73-111):
        str or list of paths -> single model pair or Ensemble."""
        from ..cli.val import load_weights

        if isinstance(weights, (str,)):
            weights = [weights]
        pairs = [load_weights(w, cfg, nc=nc) for w in weights]
        if len(pairs) == 1:
            return pairs[0]
        return cls(pairs)

    def apply(self, images, train: bool = False, decode: bool = True):
        preds = []
        for model, variables in self.members:
            p = model.apply(variables, images, train=False, decode=True)
            preds.append(p[0] if isinstance(p, tuple) else p)
        return jnp.concatenate(preds, axis=1)  # nms-ensemble concat (reference :71)

    __call__ = apply
