"""Quantify the cost of dot-operand gating in the XLA RFCBAM tail.

The fused-kernel story (nn/pallas_gated_contract.py) rests on the premise
that XLA materializes `feat * ch_gate * rf_gate` to HBM before the tap
contraction (a full write+read of the 472 MB layer-17 tap tensor at batch
128). AB_r04 measured the Pallas kernel that avoids this at 0.44-0.49x the
XLA path on the strided layers — so either the premise is wrong, or the
kernel's own inefficiencies more than eat the saved bytes. This probe
settles it by timing, at the layer-17 tail shapes:

  plain    feat @ W                       (no gating)
  gated    (feat * ch * rf) @ W           (the real tail)
  pregated g @ W with g precomputed       (upper bound: gating free)

If t_gated - t_plain ~= 2 x bytes(feat)/BW the materialization premise is
confirmed and its cost is measured; if t_gated ~= t_plain XLA fused it.

Writes runs/fused_ab/GATED_PROBE_<tag>.json. Uses the same single-dispatch
loop timing as bench.py.

    python tools/gated_cost_probe.py --batch 128 --tag r04
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


from leadyolo_tpu.utils.devicetime import loop_time  # single-dispatch timing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tag", default="r04")
    args = ap.parse_args()

    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # layer-17 tail shapes: feat (B, 40, 40, C=128, T=9) bf16 post-generate
    b, h, w, c, t, c_out = args.batch, 40, 40, 128, 9, 128
    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (b, h, w, c, t), jnp.bfloat16)
    rf = jax.nn.sigmoid(jax.random.normal(key, (b, h, w, 1, t), jnp.bfloat16))
    ch = jax.nn.sigmoid(jax.random.normal(key, (b, 1, 1, c), jnp.bfloat16))
    wt = jax.random.normal(key, (c * t, c_out), jnp.bfloat16) * 0.02
    pregated = feat * ch[..., None] * rf
    jax.block_until_ready((feat, rf, ch, wt, pregated))
    feat_gb = feat.size * 2 / 1e9

    def contract(x, wt):
        return lax.dot(
            x.reshape(b * h * w, c * t), wt, preferred_element_type=jnp.float32
        ).reshape(b, h, w, c_out)

    def plain(feat, wt):
        return contract(feat, wt)

    def gated(feat, rf, ch, wt):
        return contract(feat * ch[..., None] * rf, wt)

    def pre(g, wt):
        return contract(g, wt)

    print("timing plain ...", flush=True)
    t_plain = loop_time(plain, (feat, wt), args.iters)
    print(f"plain    {t_plain * 1e3:.3f} ms", flush=True)
    print("timing gated ...", flush=True)
    t_gated = loop_time(gated, (feat, rf, ch, wt), args.iters)
    print(f"gated    {t_gated * 1e3:.3f} ms", flush=True)
    print("timing pregated ...", flush=True)
    t_pre = loop_time(pre, (pregated, wt), args.iters)
    print(f"pregated {t_pre * 1e3:.3f} ms", flush=True)

    bw_gbs = 819.0  # v5e HBM
    result = {
        "batch": b, "feat_shape": [b, h, w, c, t], "c_out": c_out,
        "feat_gb": round(feat_gb, 3),
        "plain_ms": round(t_plain * 1e3, 3),
        "gated_ms": round(t_gated * 1e3, 3),
        "pregated_ms": round(t_pre * 1e3, 3),
        "gating_cost_ms": round((t_gated - t_plain) * 1e3, 3),
        "materialize_roundtrip_ms_at_hbm_peak": round(2 * feat_gb / bw_gbs * 1e3, 3),
        "device": str(jax.devices()[0]),
        "iters": args.iters,
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "runs", "fused_ab", f"GATED_PROBE_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
