"""Per-layer roofline of the LEAD-YOLO forward on one TPU chip.

For every layer of the network, pulls FLOPs + HBM bytes from XLA's compiled
cost analysis at its real in-network shapes (batch configurable, default the
bench batch 128) and reports:

  - ms_attributed: the layer's share of the MEASURED full forward,
    attributed by its roofline-model time max(flops/peak, bytes/bw) — the
    per-layer sum equals full_fwd_ms, unlike isolated timings
  - ms_isolated_dispatch_incl: a standalone jitted timing (includes per-dispatch tunnel
    overhead — reported for reference, never summed)
  - MFU / HBM utilization against the attributed time
  - arithmetic intensity vs the ridge point -> compute- or bandwidth-bound

Writes runs/roofline/ROOFLINE_<tag>.json and prints a markdown table for the
README perf section. This is the evidence behind "which HW limit bounds
throughput" (the reference's analog is per-layer thop profiling,
models/yolo.py:197-211).
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

# v5e (1 chip): 197 TFLOP/s bf16, 819 GB/s HBM  -> ridge ~240 FLOP/byte
PEAKS = {"v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9), "v6 lite": (918e12, 1640e9)}


def peak_for(device) -> tuple:
    name = str(device).lower()
    for k, v in PEAKS.items():
        if k in name:
            return v
    return PEAKS["v5e"]


def sync(out):
    """Force completion fetching only a SCALAR (on-device reduce): pulling a
    full tensor through the tunnel (~20 MB/s) would dominate the timing, and
    host readback is the only reliable sync on the axon backend."""
    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))


def time_jit(fn, *args, iters=15):
    """Single-dispatch per-call seconds (bench.py round-4 design; see
    leadyolo_tpu/utils/devicetime.py for the DCE/LICM rationale). Pipelined
    multi-dispatch timing was observed to disagree with this by up to 1.6x
    through the axon tunnel; this is the defensible number."""
    from leadyolo_tpu.utils.devicetime import loop_time

    return None, loop_time(fn, args, iters=iters)


def cost(f, *args):
    c = jax.jit(f).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="lead-yolo")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--tag", default="r04")
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()

    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.ops.nms import non_max_suppression
    from leadyolo_tpu.utils import enable_compilation_cache, set_fused_kernels

    enable_compilation_cache()
    set_fused_kernels(bool(args.fused))

    model = DetectionModel(args.cfg)
    variables = model.init(jax.random.PRNGKey(0))
    net = model.net
    b = args.batch
    peak_flops, peak_bw = peak_for(jax.devices()[0])
    ridge = peak_flops / peak_bw

    # shape walk: record each layer's input shapes
    in_shapes = []

    def walk(v, x):
        ys = []
        out = x
        for i, (m, f) in enumerate(zip(net.layers, net.froms)):
            if f != -1:
                out = ys[f] if isinstance(f, int) else [out if j == -1 else ys[j] for j in f]
            in_shapes.append(jax.tree.map(lambda t: t.shape, out))
            out = m.apply(
                {"params": v["params"].get(f"layers_{i}", {}),
                 "batch_stats": v.get("batch_stats", {}).get(f"layers_{i}", {})},
                out, train=False,
            )
            ys.append(out if (i in net.save or i == len(net.layers) - 1) else None)
        return out

    jax.eval_shape(walk, variables, jnp.zeros((b, args.imgsz, args.imgsz, model.ch), jnp.bfloat16))

    # whole-forward reference (bf16 fwd + decode) and the NMS stage
    def fwd(v, x):
        return model.apply(v, x, train=False, decode=True)

    x_full = jax.random.uniform(jax.random.PRNGKey(1), (b, args.imgsz, args.imgsz, 3), jnp.bfloat16)
    print("timing full forward ...", flush=True)
    _, t_full = time_jit(fwd, variables, x_full, iters=args.iters)
    fl_full, by_full = cost(fwd, variables, x_full)

    def nms_fn(p):
        return non_max_suppression(p.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, max_nms=1024)

    preds = jax.jit(fwd)(variables, x_full)
    print("timing NMS ...", flush=True)
    _, t_nms = time_jit(nms_fn, preds, iters=args.iters)

    rows = []
    for i, (m, f) in enumerate(zip(net.layers, net.froms)):
        shp = in_shapes[i]
        mkin = lambda s, k: jax.random.normal(jax.random.PRNGKey(k), s, jnp.bfloat16)
        xin = (
            [mkin(s, 7 + j) for j, s in enumerate(shp)] if isinstance(shp, list) else mkin(shp, 7)
        )
        sub = {"params": variables["params"].get(f"layers_{i}", {}),
               "batch_stats": variables.get("batch_stats", {}).get(f"layers_{i}", {})}

        def layer_fn(v, xx):
            out = m.apply(v, xx, train=False)
            # Concat returns a trace-time LazyConcat (nn/functional.py) that
            # conv consumers split without materializing; in isolation we must
            # materialize it — slight over-charge for Concat layers (the
            # in-network lazy path skips the combined write+read)
            return out.materialize() if hasattr(out, "materialize") else out

        try:
            print(f"layer {i:>2} {type(m).__name__:<22} compiling ...", flush=True)
            _, t = time_jit(layer_fn, sub, xin, iters=args.iters)
            fl, by = cost(layer_fn, sub, xin)
        except Exception as e:
            print(f"layer {i} failed: {e!r}", flush=True)
            t, fl, by = float("nan"), 0.0, 0.0
        ai = fl / by if by else 0.0
        # roofline-model time: whichever hardware limit the layer's own
        # FLOPs/bytes hit first. Used below for in-graph attribution.
        t_model = max(fl / peak_flops, by / peak_bw)
        rows.append({
            "i": i, "module": type(m).__name__, "from": f if isinstance(f, int) else list(f),
            "ms_isolated_dispatch_incl": round(t * 1e3, 3),
            "ms_model": round(t_model * 1e3, 3),
            "gflops": round(fl / 1e9, 2), "gbytes": round(by / 1e9, 3),
            "intensity": round(ai, 1),
            "bound": "compute" if ai > ridge else "bandwidth",
        })

    # In-graph attribution (round-3 verdict: isolated per-layer timings
    # include per-dispatch tunnel overhead and sum to ~8x the real forward;
    # they are kept as ms_isolated_dispatch_incl but must not be summed). Each layer's
    # share of the MEASURED full forward is attributed by its roofline-model
    # time (max of FLOP-limit and HBM-limit from XLA's per-layer cost
    # analysis) — a physical weighting whose per-layer sum equals
    # full_fwd_ms by construction. The residual factor between the model sum
    # and the measurement is reported as model_gap (measured/modelled; >1 =
    # overheads and imperfect overlap the static model can't see).
    sum_model_ms = float(np.nansum([r["ms_model"] for r in rows])) or 1.0
    for r in rows:
        t_attr = (r["ms_model"] / sum_model_ms) * (t_full * 1e3)
        r["ms_attributed"] = round(t_attr, 3)
        if t_attr > 0:
            r["mfu_pct"] = round(100 * r["gflops"] / t_attr / (peak_flops / 1e12), 1)
            r["hbm_pct"] = round(100 * r["gbytes"] / t_attr / (peak_bw / 1e12), 1)
        else:
            r["mfu_pct"] = r["hbm_pct"] = 0.0

    sum_layer_ms = float(np.nansum([r["ms_isolated_dispatch_incl"] for r in rows]))
    result = {
        "batch": b, "imgsz": args.imgsz, "cfg": args.cfg, "fused": bool(args.fused),
        "device": str(jax.devices()[0]),
        "peak_tflops": peak_flops / 1e12, "peak_gbs": peak_bw / 1e9, "ridge_flop_per_byte": round(ridge, 1),
        "full_fwd_ms": round(t_full * 1e3, 3),
        "full_fwd_gflops": round(fl_full / 1e9, 2),
        "full_fwd_gbytes": round(by_full / 1e9, 3),
        "full_fwd_mfu_pct": round(100 * fl_full / t_full / peak_flops, 1),
        "full_fwd_hbm_pct": round(100 * by_full / t_full / peak_bw, 1),
        "nms_ms": round(t_nms * 1e3, 3),
        "imgs_per_sec_fwd_nms": round(b / (t_full + t_nms), 1),
        "sum_isolated_dispatch_incl_ms": round(sum_layer_ms, 2),
        "sum_model_ms": round(sum_model_ms, 2),
        "sum_attributed_ms": round(float(np.nansum([r["ms_attributed"] for r in rows])), 2),
        "model_gap": round(t_full * 1e3 / sum_model_ms, 2),
        "layers": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "runs", "roofline", f"ROOFLINE_{args.tag}{'_fused' if args.fused else ''}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)

    print(f"\nfull fwd {result['full_fwd_ms']} ms  ({result['full_fwd_gflops']} GFLOP, "
          f"MFU {result['full_fwd_mfu_pct']}%, HBM {result['full_fwd_hbm_pct']}%)  "
          f"NMS {result['nms_ms']} ms  -> {result['imgs_per_sec_fwd_nms']} img/s")
    print(f"(attributed ms sum = {result['sum_attributed_ms']} ≈ full fwd; "
          f"isolated ms include per-dispatch overhead — do not sum. "
          f"model_gap {result['model_gap']}x)")
    print(f"| # | module | ms (attr) | % fwd | ms (isolated) | GFLOP | GB | MFU % | HBM % | bound |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    t_full_ms = t_full * 1e3
    for r in rows:
        print(f"| {r['i']} | {r['module']} | {r['ms_attributed']} "
              f"| {round(100 * r['ms_attributed'] / t_full_ms, 1)} | {r['ms_isolated_dispatch_incl']} "
              f"| {r['gflops']} | {r['gbytes']} | {r['mfu_pct']} | {r['hbm_pct']} | {r['bound']} |")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
