"""int8 TFLite quality sweep: measure mAP for each quantization flavor.

Round-3 full-integer int8 lost a third of the mAP (0.7013 -> 0.4656,
SWEEP_r03). This sweep runs the VERDICT-ordered candidates on the FULL SSDD
val split (reference benchmarks.py:52-113 contract):

  fp32       — float TFLite control
  8x8        — full-integer, in-graph normalized decode (the r03 row)
  16x8       — int8 weights + int16 activations
  8x8-split  — full-integer backbone+heads, decode outside the quantized
               graph (MultiBackend raw_heads float decode)

Writes runs/benchmarks/INT8_r04.md + .json. CPU-only (TFLite runtime).

Usage: python tools/int8_sweep.py [--n-eval 0 (=full)] [--out-tag r04]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def evaluate(artifact, data_cfg, imgsz=640, n_eval=None, batch=1):
    """Thin wrapper over the benchmark sweep's eval contract — ONE shared
    implementation (cli/benchmarks.evaluate_artifact) so the int8 quality
    numbers can never drift from the gate that consumes them."""
    from leadyolo_tpu.cli.benchmarks import evaluate_artifact
    from leadyolo_tpu.data.datasets import YoloDataset

    ds = YoloDataset(data_cfg["val"], img_size=imgsz, augment=False, max_targets=128)
    n_eval = len(ds) if not n_eval else min(n_eval, len(ds))
    r = evaluate_artifact(artifact, data_cfg, ds, n_eval, imgsz=imgsz, batch=batch)
    return dict(
        map50=round(r["map50"], 4),
        map5095=round(r["map5095"], 4),
        ms_per_img=round(r["ms_per_img"], 1),
        n_eval=n_eval,
        size_mb=round(os.path.getsize(artifact) / 1e6, 2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/lead-yolo-ssdd.ckpt")
    ap.add_argument("--n-eval", type=int, default=0, help="0 = full val split")
    ap.add_argument("--out-tag", default="r04")
    ap.add_argument("--modes", nargs="+", default=["fp32", "8x8", "16x8", "8x8-split"])
    args = ap.parse_args()

    from leadyolo_tpu.cli.export import run as export_run
    from leadyolo_tpu.train.trainer import resolve_data

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    data_cfg = resolve_data("ssdd")
    out_dir = os.path.join("runs", "benchmarks", f"int8_{args.out_tag}")
    rows = {}
    for mode in args.modes:
        d = os.path.join(out_dir, mode.replace("8x8-split", "split"))
        arts = export_run(
            args.weights, include=["tflite"], imgsz=640, batch=1,
            int8=(mode != "fp32"), data=data_cfg["train"] if mode != "fp32" else None,
            out_dir=d, quant_mode=mode if mode != "fp32" else "8x8",
        )
        if not arts or not arts[0]:
            rows[mode] = {"error": "export failed"}
            continue
        print(f"[int8_sweep] evaluating {mode}: {arts[0]}", flush=True)
        try:
            rows[mode] = evaluate(arts[0], data_cfg, n_eval=args.n_eval)
        except Exception as e:
            rows[mode] = {"error": repr(e)[:300]}
        print(f"[int8_sweep] {mode}: {rows[mode]}", flush=True)

    out_json = os.path.join("runs", "benchmarks", f"INT8_{args.out_tag}.json")
    with open(out_json, "w") as f:
        json.dump(rows, f, indent=1)
    lines = [
        f"# int8 quantization sweep — {args.out_tag} (full SSDD val split)",
        "",
        "Regenerate: `python tools/int8_sweep.py`. See cli/export.py `quant_mode`.",
        "",
        "| mode | mAP50 | mAP50-95 | ms/img (CPU) | size MB |",
        "|---|---|---|---|---|",
    ]
    for mode, r in rows.items():
        if "error" in r:
            lines.append(f"| {mode} (failed: {r['error']}) | — | — | — | — |")
        else:
            lines.append(
                f"| {mode} | {r['map50']} | {r['map5095']} | {r['ms_per_img']} | {r['size_mb']} |"
            )
    lines += [
        "",
        "Notes:",
        "- `8x8-split` is the shipping int8 flavor (benchmarks.py `--int8` row):",
        "  full-integer backbone+heads with decode OUTSIDE the quantized graph",
        "  (MultiBackend raw_heads float decode). The r03 in-graph-decode 8x8",
        "  lost a third of the mAP because boxes and probabilities shared",
        "  per-tensor output scales; splitting removes box quantization",
        "  entirely while the quantized region stays EdgeTPU-compatible",
        "  (detection decode conventionally runs on CPU there anyway).",
        "- `16x8` (int16 activations) recovers part of the in-graph loss but",
        "  its CPU ms/img uses TFLite reference kernels — slow on this host,",
        "  irrelevant on int16-capable NPUs.",
        "- ms/img is CPU-interpreter time for format fidelity only; the TPU",
        "  throughput story lives in bench.py / the README roofline.",
    ]
    with open(os.path.join("runs", "benchmarks", f"INT8_{args.out_tag}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
