"""Single-dispatch on-device timing (the round-4 bench.py design).

The axon tunnel charges ~350 ms per host dispatch, so any per-call timing
through it measures the tunnel, not the chip. `loop_time` runs `iters`
calls back-to-back INSIDE one jitted `lax.fori_loop`:

- the loop cycles over TWO numerically distinct copies of the inputs,
  indexed by the loop counter — defeats both loop-invariant code motion
  and value-level CSE;
- the carry folds a scalar reduction of EVERY output leaf, so no part of
  the computation is dead-code-eliminable (reducing only the first leaf
  lets XLA delete sibling outputs — e.g. 2 of the Detect head's 3 scale
  maps);
- completion is forced with a host readback of the scalar (`float(...)`),
  the only reliable sync on the tunnel.

Used by tools/roofline.py and tools/gated_cost_probe.py; bench.py inlines
the same pattern deliberately (the driver gate stays self-contained).
"""
from __future__ import annotations

import time


def loop_time(fn, args, iters: int = 30) -> float:
    """Seconds per call of ``fn(*args)``, timed as ONE dispatch of a jitted
    ``iters``-trip loop over device-resident inputs."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def perturb(a):
        if jnp.issubdtype(a.dtype, jnp.inexact):
            return a + jnp.asarray(1e-3, a.dtype)
        return a

    xs = jax.tree.map(lambda a: jnp.stack([a, perturb(a)]), tuple(args))

    @jax.jit
    def lp(xs, it):
        def body(i, acc):
            cur = jax.tree.map(
                lambda s: lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False), xs
            )
            out = fn(*cur)
            for leaf in jax.tree.leaves(out):
                acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-9
            return acc

        return lax.fori_loop(0, it, body, jnp.float32(0.0))

    float(lp(xs, 1))  # compile + settle
    t0 = time.perf_counter()
    float(lp(xs, iters))
    return (time.perf_counter() - t0) / iters
