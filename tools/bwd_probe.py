"""Backward-cost attribution probe: which op owns the 89.5 ms backward?

STEP_ROOFLINE_r05 measured the train step's backward increment at 5.5x the
forward (89.5 vs 16.4 ms, bs64 bf16) — far over the ~2x a conv net should
pay. This probe times fwd and fwd+bwd for each suspect in isolation with the
single-dispatch loop harness, so the blame lands on an op, not a theory.

Suspects: the RFA depthwise-multiplier convs (g=c, c -> c*k^2 — XLA's
grouped-conv filter-gradient is a known TPU sore spot), their slice+einsum
reformulation, dense-conv controls, and the whole blocks they live in.

    python tools/bwd_probe.py --batch 64 --iters 20
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _timed_loop(fn, args_dev, iters, repeats=3):
    @jax.jit
    def loop(a, iters):
        def body(i, acc):
            # perturb one input by the loop counter so the body can't be
            # hoisted; fold every output into the scalar carry
            out = fn(*a[:-1], jax.tree.map(lambda v: v + (acc * 1e-20).astype(v.dtype), a[-1]))
            return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)) * 1e-12
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(args_dev, 1))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(args_dev, iters))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def dw_mult_conv(x, w, s):
    """The RFA generate conv: g=C grouped conv C -> C*k^2 (nn/rfa.py:36)."""
    return lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=x.shape[-1])


def dw_mult_slice_einsum(x, w9, s):
    """Same math via k^2 strided slices + per-channel (9x9) einsum: patch
    extraction is pure data movement (backward = scatter-add), the weight
    einsum is a batched small matmul — no grouped-conv gradient kernels."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    Ho = (H + s - 1) // s
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(xp[:, dy: dy + H: s, dx: dx + W: s, :])
    patches = jnp.stack(taps, axis=3)  # (B, Ho, Wo, 9, C)
    # out[..., c, t_out] = sum_t_in patches[..., t_in, c] * w9[c, t_out, t_in]
    out = jnp.einsum("bhwic,coi->bhwco", patches, w9.astype(x.dtype))
    return out.reshape(out.shape[:3] + (-1,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tag", default="r05")
    args = ap.parse_args()

    from leadyolo_tpu.nn.attention import C3_CA
    from leadyolo_tpu.nn.fasternet import BasicStage
    from leadyolo_tpu.nn.rfa import RFCBAMConv
    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    b = args.batch
    rows = []

    def probe(name, f, *xs):
        """Time fwd and fwd+bwd (grad wrt ALL inputs) of f."""
        xs = [jax.device_put(v) for v in xs]
        jax.block_until_ready(xs)
        t_f = _timed_loop(f, tuple(xs), args.iters)

        def loss(*a):
            return jnp.sum(f(*a).astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss, argnums=tuple(range(len(xs))))
        t_fb = _timed_loop(g, tuple(xs), args.iters)
        rows.append({"op": name, "fwd_ms": round(t_f * 1e3, 2),
                     "fwd_bwd_ms": round(t_fb * 1e3, 2),
                     "bwd_over_fwd": round(t_fb / max(t_f, 1e-9), 1)})
        print(f"[bwd_probe] {name:<42} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms "
              f"({t_fb/max(t_f,1e-9):.1f}x)", flush=True)

    # --- L17-shaped RFA generate conv: (64,80,80,128) -> (64,40,40,1152)
    x17 = rng.normal(0, 1, (b, 80, 80, 128)).astype(np.float32).astype(jnp.bfloat16)
    w17 = (rng.normal(0, 0.05, (3, 3, 1, 1152))).astype(jnp.bfloat16)
    w17_9 = (rng.normal(0, 0.05, (128, 9, 9))).astype(jnp.bfloat16)
    probe("dwmult_conv L17 (g=128, 128->1152, s2)", functools.partial(dw_mult_conv, s=2), x17, w17)
    probe("dwmult_slice_einsum L17", functools.partial(dw_mult_slice_einsum, s=2), x17, w17_9)

    # --- L20-shaped: (64,40,40,256) -> (64,20,20,2304)
    x20 = rng.normal(0, 1, (b, 40, 40, 256)).astype(np.float32).astype(jnp.bfloat16)
    w20 = (rng.normal(0, 0.05, (3, 3, 1, 2304))).astype(jnp.bfloat16)
    w20_9 = (rng.normal(0, 0.05, (256, 9, 9))).astype(jnp.bfloat16)
    probe("dwmult_conv L20 (g=256, 256->2304, s2)", functools.partial(dw_mult_conv, s=2), x20, w20)
    probe("dwmult_slice_einsum L20", functools.partial(dw_mult_slice_einsum, s=2), x20, w20_9)

    # --- dense control: same input, ordinary k3 s2 conv 128->256
    wd = (rng.normal(0, 0.05, (3, 3, 128, 256))).astype(jnp.bfloat16)
    probe("dense_conv control (128->256 k3 s2)",
          lambda x, w: lax.conv_general_dilated(
              x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
              dimension_numbers=("NHWC", "HWIO", "NHWC")), x17, wd)

    # --- whole blocks (param grads via apply)
    def block_probe(name, mod, x):
        v = mod.init(jax.random.PRNGKey(0), x, True)
        xs = (v["params"], x)

        def fwd(p, xx):
            out = mod.apply({"params": p, "batch_stats": v.get("batch_stats", {})},
                            xx, True, mutable=["batch_stats"])[0]
            return out.materialize() if hasattr(out, "materialize") else out

        t_f = _timed_loop(fwd, (v["params"], jax.device_put(x)), args.iters)

        def loss(p, xx):
            return jnp.sum(fwd(p, xx).astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss, argnums=(0, 1))
        t_fb = _timed_loop(g, (v["params"], jax.device_put(x)), args.iters)
        rows.append({"op": name, "fwd_ms": round(t_f * 1e3, 2),
                     "fwd_bwd_ms": round(t_fb * 1e3, 2),
                     "bwd_over_fwd": round(t_fb / max(t_f, 1e-9), 1)})
        print(f"[bwd_probe] {name:<42} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms "
              f"({t_fb/max(t_f,1e-9):.1f}x)", flush=True)

    block_probe("RFCBAMConv L17 block (256, k3 s2)", RFCBAMConv(128, 3, 2), x17)
    block_probe("RFCBAMConv L20 block (512, k3 s2)", RFCBAMConv(256, 3, 2), x20)
    block_probe("C3_CA block (c=256, n=1)", C3_CA(256, n=1, shortcut=False), x20)
    block_probe("BasicStage (FasterNet, c=160)",
                BasicStage(160, depth=1), rng.normal(0, 1, (b, 40, 40, 160)).astype(jnp.bfloat16))

    out = {"batch": b, "iters": args.iters, "device": str(jax.devices()[0]), "rows": rows}
    dst = os.path.join(_REPO, "runs", "input_wall", f"BWD_PROBE_{args.tag}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
