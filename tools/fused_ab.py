"""On-TPU A/B verification of the fused Pallas gated tap-contraction.

Runs all four LEAD-YOLO RFCBAM head layers (reference models/rfa.py:95-129;
shapes from utils/profiling.profile_layers at 640px) through BOTH the XLA
formulation (nn/rfa.py) and the fused Pallas path
(nn/pallas_gated_contract.py) on the real chip, comparing numerics and
timing.

Writes runs/fused_ab/AB_<tag>.json. bench.py only enables the fused path when
the newest such artifact has "ok": true — this script IS the blessing gate.

Usage:
    python tools/fused_ab.py --batch 128 --tag r03
    python tools/fused_ab.py --batch 2 --layers 20 --no-write   # quick probe
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the four RFCBAMConv head layers of lead-yolo.yaml at 640px
# (inputs per utils/profiling.profile_layers: 9 <- SPPF, 13 <- C3_CA-12,
#  17 <- C3_CA-16, 20 <- C3_CA-19)
LAYERS = {
    "9": dict(h=20, w=20, c=160, c2=256, k=1, s=1),
    "13": dict(h=40, w=40, c=256, c2=128, k=1, s=1),
    "17": dict(h=80, w=80, c=128, c2=128, k=3, s=2),
    "20": dict(h=40, w=40, c=256, c2=256, k=3, s=2),
}


def log(msg):
    print(msg, flush=True)


def _drain(out):
    """Force completion fetching only a SCALAR: reducing on device and pulling
    one float avoids hauling the whole output through the tunnel (~20 MB/s),
    and a host readback is the only reliable sync on the axon backend."""
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def bench_fn(fn, *args, iters=20):
    """Pipelined per-call seconds: the axon tunnel adds ~28 ms round-trip
    latency per sync, so we dispatch `iters` async calls and sync ONCE on the
    last output (same-device ops serialize, so draining the last implies all
    finished) — per-call time is total/iters with the latency amortized."""
    _drain(fn(*args))  # compile + settle
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters


def run_layer(name, spec, batch, iters):
    from leadyolo_tpu.nn.pallas_gated_contract import pick_row_block
    from leadyolo_tpu.nn.rfa import RFCBAMConv
    from leadyolo_tpu.utils import set_fused_kernels

    h, w, c, c2, k, s = (spec[x] for x in ("h", "w", "c", "c2", "k", "s"))
    bm = pick_row_block((h // s) * (w // s), c * k * k, c2)
    log(f"[layer {name}] ({batch},{h},{w},{c})->{c2} k={k} s={s}  block_rows={bm}")

    m = RFCBAMConv(c2=c2, k=k, s=s)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, c), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, c), jnp.float32))
    # non-trivial BN stats so the fp32 folding is exercised
    bs = jax.tree.map(
        lambda t: t + 0.05 * jax.random.normal(jax.random.PRNGKey(2), t.shape) ** 2,
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": bs}

    set_fused_kernels(False)
    try:
        xla_fn = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False))
        log(f"[layer {name}] compiling XLA path ...")
        t_xla = bench_fn(xla_fn, v, x, iters=iters)
        ref = np.asarray(xla_fn(v, x), np.float32)
    finally:
        set_fused_kernels(None)

    set_fused_kernels(True)
    try:
        fused_fn = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False))
        log(f"[layer {name}] compiling fused Pallas path ...")
        t_fused = bench_fn(fused_fn, v, x, iters=iters)
        out = np.asarray(fused_fn(v, x), np.float32)
    finally:
        set_fused_kernels(None)

    diff = np.abs(out - ref)
    rec = {
        "layer": name,
        "shape": [batch, h, w, c],
        "c2": c2,
        "k": k,
        "s": s,
        "block_rows": bm,
        "xla_ms": round(t_xla * 1e3, 3),
        "fused_ms": round(t_fused * 1e3, 3),
        "speedup": round(t_xla / t_fused, 3),
        "max_abs_diff": float(diff.max()),
        "p99_abs_diff": float(np.quantile(diff, 0.99)),
        "ref_abs_p99": float(np.quantile(np.abs(ref), 0.99)),
    }
    rec["pass"] = bool(rec["p99_abs_diff"] < 0.03 and rec["max_abs_diff"] < 0.5)
    log(f"[layer {name}] {json.dumps(rec)}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layers", default="9,13,17,20")
    ap.add_argument("--tag", default="r03")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    recs = [run_layer(n, LAYERS[n], args.batch, args.iters) for n in args.layers.split(",")]
    speedup = float(np.exp(np.mean([np.log(r["speedup"]) for r in recs])))
    result = {
        "ok": all(r["pass"] for r in recs),
        # bench.py only routes through the fused path when it is BOTH
        # numerically verified and actually faster than XLA on this chip
        "faster": speedup > 1.02,
        "speedup_geomean": round(speedup, 3),
        "batch": args.batch,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "layers": recs,
    }
    log(json.dumps(result))
    if not args.no_write:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "runs", "fused_ab", f"AB_{args.tag}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        log(f"wrote {out}")


if __name__ == "__main__":
    main()
