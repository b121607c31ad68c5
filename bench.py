"""Headline benchmark: LEAD-YOLO end-to-end inference throughput on one TPU chip.

Pipeline under test = bf16 forward + anchor decode + on-device NMS at 640px
(the reference's FPS metric is 1000/(pre+infer+NMS) per image at batch 1,
val.py:301-306; its published LEAD-YOLO number is 35.3 FPS on an unspecified
cloud GPU — BASELINE.md). We report images/sec at the throughput-optimal batch
and compare against that 35.3 img/s baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "path"}.

Crash safety (round-2 postmortem): the gate must NEVER exit non-zero because
of an experimental kernel. The fused Pallas path is attempted only when a
committed on-chip A/B verification artifact (runs/fused_ab/AB_*.json,
"ok": true) blesses it, and even then it runs in a SUBPROCESS — a Mosaic
kernel fault kills the child, not the gate — with the XLA path as fallback.
"""
import json
import os
import subprocess
import sys
import time

BASELINE_FPS = 35.3  # reference LEAD-YOLO FPS (reference README.md:126-128)
BATCH = 128  # throughput-optimal on v5e (32: ~2.9k, 64: ~3.3k, 128: ~4.0k img/s)
ITERS = 50
FUSED_SUBPROC_TIMEOUT_S = 2400  # cold Mosaic compile via the remote tunnel is ~10 min


def _fused_blessed() -> bool:
    """True iff a committed A/B artifact verifies the fused kernels on real TPU."""
    env = os.environ.get("LEADYOLO_BENCH_FUSED")
    if env is not None:
        return env not in ("0", "false", "off")
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "runs", "fused_ab")
    if not os.path.isdir(d):
        return False
    for name in sorted(os.listdir(d), reverse=True):
        if name.startswith("AB_") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
                # fused must be verified correct on this hardware AND faster
                # than the XLA path to be worth routing the gate through
                return bool(rec.get("ok")) and bool(rec.get("faster"))
            except Exception:
                return False
    return False


def run_bench(fused: bool) -> float:
    """Build the model and measure e2e images/sec. Returns imgs/sec."""
    import jax
    import jax.numpy as jnp

    from leadyolo_tpu.utils import enable_compilation_cache, set_fused_kernels

    enable_compilation_cache()
    set_fused_kernels(fused)
    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.ops.nms import non_max_suppression

    model = DetectionModel("lead-yolo")
    variables = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def infer(variables, images):
        preds = model.apply(variables, images.astype(jnp.bfloat16), train=False, decode=True)
        det, valid, _ = non_max_suppression(
            preds.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=1024
        )
        return det, valid

    images = [
        jax.random.uniform(jax.random.PRNGKey(i), (BATCH, 640, 640, 3), jnp.float32)
        for i in range(4)
    ]

    # compile + warmup (float() forces a real device round-trip — the axon
    # tunnel's block_until_ready alone does not guarantee completion)
    float(jnp.sum(infer(variables, images[0])[0]))

    t0 = time.perf_counter()
    outs = [infer(variables, images[i % 4]) for i in range(ITERS)]
    float(jnp.sum(outs[-1][0]))  # drain the pipeline
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def _emit(imgs_per_sec: float, path: str):
    print(
        json.dumps(
            {
                "metric": "lead-yolo_640px_e2e_infer_throughput",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_FPS, 2),
                "path": path,
            }
        )
    )


def main():
    if "--fused-worker" in sys.argv:
        # child process: run the fused bench; a kernel fault only kills us
        print(json.dumps({"fused_imgs_per_sec": run_bench(fused=True)}))
        return

    if _fused_blessed():
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--fused-worker"],
                capture_output=True,
                text=True,
                timeout=FUSED_SUBPROC_TIMEOUT_S,
            )
            if out.returncode == 0:
                for line in reversed(out.stdout.strip().splitlines()):
                    try:
                        val = json.loads(line).get("fused_imgs_per_sec")
                    except Exception:
                        continue
                    if val:
                        _emit(val, "pallas-fused")
                        return
            sys.stderr.write(
                f"fused bench subprocess failed (rc={out.returncode}); "
                f"falling back to XLA path\n{out.stderr[-2000:]}\n"
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write("fused bench subprocess timed out; falling back to XLA path\n")
        except Exception as e:  # never let the probe take down the gate
            sys.stderr.write(f"fused bench probe error ({e!r}); falling back to XLA path\n")

    _emit(run_bench(fused=False), "xla")


if __name__ == "__main__":
    main()
