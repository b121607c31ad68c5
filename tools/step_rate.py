"""On-device train-step throughput (img/s/chip) via a single-dispatch loop.

Same measurement design as bench.py (round-4): a jitted `lax.fori_loop`
carries the train state through ITERS full train steps (fwd + EIoU loss +
bwd + clip + SGD + EMA) on synthetic device-resident batches, so the axon
tunnel's per-dispatch latency cannot pollute the number. This is the
multi-chip feeding denominator: one host's loader (tools/input_wall.py) must
sustain N_chips x this rate to keep an N-chip data-parallel mesh busy
(SURVEY.md §7 hard part 6).

    python tools/step_rate.py --batch 64 --iters 20 --tag r04
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64, help="images consumed per optimizer step")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="lead-yolo")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-targets", type=int, default=64)
    ap.add_argument("--tag", default="r04")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                    help="compute dtype; bfloat16 is what the trainer actually uses "
                    "(trainer.py:69). The r04 artifact was accidentally measured at "
                    "TrainConfig's float32 default — see STEP_ROOFLINE_r05.json")
    args = ap.parse_args()

    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.train.loss import LossConfig
    from leadyolo_tpu.train.step import TrainConfig, init_train_state, make_train_step
    from leadyolo_tpu.train.trainer import load_hyp
    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model = DetectionModel(args.cfg, nc=1, img_size=args.imgsz)
    variables = model.init(jax.random.PRNGKey(0), img_size=args.imgsz)
    hyp = load_hyp("scratch-low")
    cfg = TrainConfig(
        loss=LossConfig.from_hyp(model, hyp, imgsz=args.imgsz),
        warmup_steps=1,  # past warmup: measure the steady-state step
        epochs=300,
        steps_per_epoch=100,
        accumulate=1,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    step = make_train_step(model, cfg, donate=False)

    state = init_train_state(variables)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(0, 256, (args.batch, args.imgsz, args.imgsz, 3), np.uint8))
    nt = args.max_targets
    targets = np.zeros((args.batch, nt, 5), np.float32)
    targets[:, :4, 1:] = rng.uniform(0.3, 0.6, (args.batch, 4, 4))
    tmask = np.zeros((args.batch, nt), bool)
    tmask[:, :4] = True
    targets, tmask = jax.device_put(targets), jax.device_put(tmask)
    jax.block_until_ready((images, targets, tmask))

    @jax.jit
    def loop(state, images, targets, tmask, iters):
        def body(i, st):
            st2, _ = step(st, images, targets, tmask)
            return st2

        return lax.fori_loop(0, iters, body, state)

    print("compiling train-step loop ...", flush=True)
    t0 = time.perf_counter()
    st = loop(state, images, targets, tmask, 1)
    # forced host readback is the only reliable sync on the axon tunnel
    float(jnp.sum(jax.tree.leaves(st.params)[0].astype(jnp.float32)))
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    st = loop(state, images, targets, tmask, args.iters)
    drain = float(st.step) + float(jnp.sum(jax.tree.leaves(st.params)[0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    ms_per_step = dt * 1000 / args.iters
    imgs_per_sec = args.batch * args.iters / dt
    result = {
        "batch": args.batch, "imgsz": args.imgsz, "cfg": args.cfg, "iters": args.iters,
        "dtype": args.dtype, "device": str(jax.devices()[0]),
        "ms_per_step": round(ms_per_step, 2),
        "imgs_per_sec_per_chip": round(imgs_per_sec, 1),
        "drain": drain,
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "runs", "input_wall", f"STEP_RATE_{args.tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
