"""Same-process A/B: train step with masked-dense vs grouped RFA generate conv.

The shared axon chip's window-to-window noise (observed 1.6x on the bench)
makes cross-run comparisons of the train step untrustworthy; this tool
compiles BOTH step variants in one process and times them interleaved with
the single-dispatch loop harness, so the verdict on Conv2d.g_dense
(BWD_PROBE_r05's predicted -6 ms) is measured under identical load.

    python tools/dense_grad_ab.py --batch 64 --iters 20 --rounds 3
"""
from __future__ import annotations

import argparse
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


def build_step(dense: bool, args):
    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.train.loss import LossConfig
    from leadyolo_tpu.train.step import TrainConfig, init_train_state, make_train_step
    from leadyolo_tpu.train.trainer import load_hyp
    from leadyolo_tpu.utils import set_dense_grad

    set_dense_grad(dense)
    model = DetectionModel("lead-yolo", nc=1, img_size=args.imgsz)
    variables = model.init(jax.random.PRNGKey(0), img_size=args.imgsz)
    hyp = load_hyp("scratch-low")
    cfg = TrainConfig(loss=LossConfig.from_hyp(model, hyp, imgsz=args.imgsz),
                      warmup_steps=1, epochs=300, steps_per_epoch=100, accumulate=1,
                      compute_dtype=jnp.bfloat16)
    step = make_train_step(model, cfg, donate=False)
    state = init_train_state(variables)

    @jax.jit
    def loop(state, images, targets, tmask, iters):
        def body(i, st):
            im = lax.dynamic_index_in_dim(images, i % 2, 0, keepdims=False)
            st2, _ = step(st, im, targets, tmask)
            return st2
        return lax.fori_loop(0, iters, body, state)

    return loop, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    b, sz, nt = args.batch, args.imgsz, 64
    images = jax.device_put(rng.integers(0, 256, (2, b, sz, sz, 3), np.uint8))
    targets_np = np.zeros((b, nt, 5), np.float32)
    targets_np[:, :4, 1:] = rng.uniform(0.3, 0.6, (b, 4, 4))
    tmask_np = np.zeros((b, nt), bool)
    tmask_np[:, :4] = True
    targets, tmask = jax.device_put(targets_np), jax.device_put(tmask_np)
    jax.block_until_ready((images, targets, tmask))

    arms = {}
    for name, dense in (("dense", True), ("grouped", False)):
        loop, state = build_step(dense, args)
        print(f"[dense_grad_ab] compiling {name} ...", flush=True)
        st = loop(state, images, targets, tmask, 1)
        float(jnp.sum(jax.tree.leaves(st.params)[0].astype(jnp.float32)))
        arms[name] = (loop, state, [])

    for r in range(args.rounds):  # interleaved: same load window for both
        for name, (loop, state, ts) in arms.items():
            t0 = time.perf_counter()
            st = loop(state, images, targets, tmask, args.iters)
            float(jnp.sum(jax.tree.leaves(st.params)[0].astype(jnp.float32)))
            ts.append((time.perf_counter() - t0) / args.iters * 1e3)
            print(f"[dense_grad_ab] round {r+1} {name}: {ts[-1]:.2f} ms/step", flush=True)

    out = {"batch": b, "iters": args.iters, "rounds": args.rounds,
           "device": str(jax.devices()[0])}
    for name, (_, _, ts) in arms.items():
        out[name] = {"best_ms": round(min(ts), 2), "all_ms": [round(t, 2) for t in ts],
                     "imgs_per_sec": round(b / (min(ts) / 1e3), 1)}
    out["dense_minus_grouped_ms"] = round(min(arms["dense"][2]) - min(arms["grouped"][2]), 2)
    dst = os.path.join(_REPO, "runs", "input_wall", "DENSE_GRAD_AB_r05.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("dense", "grouped", "dense_minus_grouped_ms")}))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
