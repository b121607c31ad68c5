"""Train-step roofline: where the 140 ms went (round-4 verdict missing #2).

Measures the jitted train step's components with the same single-dispatch
`lax.fori_loop` harness as bench.py, as an INCREMENTAL pipeline so the
components sum to the measured full step by construction:

    fwd           = forward (train=True, BN stat update)
    loss          = (fwd + loss)            - fwd
    bwd           = value_and_grad(...)     - (fwd + loss)
    opt           = full step (clip+SGD+EMA) - value_and_grad

Each variant is timed inside one dispatch (2 device-resident batches,
dynamic-indexed per iteration so XLA can't hoist the body), and XLA's
cost_analysis supplies FLOPs/bytes per variant for bound attribution.

Round-4 postmortem: STEP_RATE_r04.json (140.4 ms @ bs64) was measured with
TrainConfig's DEFAULT compute_dtype — fp32 — while the forward budget it was
compared against came from the bf16 roofline. The trainer itself trains in
bf16 (trainer.py:69). This tool measures both dtypes so the comparison is
apples-to-apples, and step_rate.py now defaults to bf16.

    python tools/step_roofline.py --batch 64 --iters 20 --tag r05
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


def _time_loop(fn, args_dev, iters, repeats=3):
    """Best-of-repeats seconds per iteration for jitted fn(*args, iters)."""
    float(np.asarray(jax.tree.leaves(fn(*args_dev, 1))[0], np.float64).sum())  # compile+warm
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args_dev, iters)
        float(np.asarray(jax.tree.leaves(out)[0], np.float64).sum())  # forced readback sync
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def _cost(fn, *args):
    """(gflops, gbytes) from XLA cost analysis of fn(*args) (one iteration)."""
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0)) / 1e9, float(c.get("bytes accessed", 0)) / 1e9
    except Exception:
        return 0.0, 0.0


def measure(args, compute_dtype):
    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.train.loss import LossConfig, compute_loss
    from leadyolo_tpu.train.step import TrainConfig, init_train_state, make_train_step
    from leadyolo_tpu.train.trainer import load_hyp

    model = DetectionModel(args.cfg, nc=1, img_size=args.imgsz)
    variables = model.init(jax.random.PRNGKey(0), img_size=args.imgsz)
    hyp = load_hyp("scratch-low")
    loss_cfg = LossConfig.from_hyp(model, hyp, imgsz=args.imgsz)
    cfg = TrainConfig(loss=loss_cfg, warmup_steps=1, epochs=300, steps_per_epoch=100,
                      accumulate=1, compute_dtype=compute_dtype)
    step = make_train_step(model, cfg, donate=False)
    state = init_train_state(variables)

    rng = np.random.default_rng(0)
    b, sz, nt = args.batch, args.imgsz, args.max_targets
    images_np = rng.integers(0, 256, (2, b, sz, sz, 3), np.uint8)
    targets_np = np.zeros((b, nt, 5), np.float32)
    targets_np[:, :4, 1:] = rng.uniform(0.3, 0.6, (b, 4, 4))
    tmask_np = np.zeros((b, nt), bool)
    tmask_np[:, :4] = True
    images = jax.device_put(images_np)  # (2, B, H, W, 3): dynamic-indexed per iter
    targets, tmask = jax.device_put(targets_np), jax.device_put(tmask_np)
    jax.block_until_ready((images, targets, tmask))

    params, stats = state.params, state.batch_stats

    def fwd_only(params, stats, im):
        x = im.astype(compute_dtype)
        if im.dtype == jnp.uint8:
            x = x / 255.0
        outs, new_stats = model.net.apply(
            {"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"])
        return outs, new_stats["batch_stats"]

    def fwd_loss(params, stats, im, tg, tm):
        outs, new_stats = fwd_only(params, stats, im)
        loss, comps = compute_loss(outs, tg, tm, loss_cfg)
        return loss, new_stats

    grad_fn = jax.value_and_grad(lambda p, s, im, tg, tm: fwd_loss(p, s, im, tg, tm)[0])

    # ---- single-dispatch loops (batch index i%2 defeats hoisting/CSE) ----
    @jax.jit
    def loop_fwd(params, stats, images, iters):
        def body(i, carry):
            acc, st = carry
            im = lax.dynamic_index_in_dim(images, i % 2, 0, keepdims=False)
            outs, new_st = fwd_only(params, st, im)
            leaves = [jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(outs)]
            return acc + sum(leaves) * 1e-9, new_st
        return lax.fori_loop(0, iters, body, (jnp.float32(0.0), stats))[0]

    @jax.jit
    def loop_loss(params, stats, images, targets, tmask, iters):
        def body(i, carry):
            acc, st = carry
            im = lax.dynamic_index_in_dim(images, i % 2, 0, keepdims=False)
            l, new_st = fwd_loss(params, st, im, targets, tmask)
            return acc + l.astype(jnp.float32), new_st
        return lax.fori_loop(0, iters, body, (jnp.float32(0.0), stats))[0]

    @jax.jit
    def loop_grad(params, stats, images, targets, tmask, iters):
        def body(i, acc):
            im = lax.dynamic_index_in_dim(images, i % 2, 0, keepdims=False)
            l, g = grad_fn(params, stats, im, targets, tmask)
            g0 = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
            return acc + l.astype(jnp.float32) + g0 * 1e-9
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def loop_step(state, images, targets, tmask, iters):
        def body(i, st):
            im = lax.dynamic_index_in_dim(images, i % 2, 0, keepdims=False)
            st2, _ = step(st, im, targets, tmask)
            return st2
        return lax.fori_loop(0, iters, body, state)

    it = args.iters
    print(f"[step_roofline] dtype={compute_dtype.__name__}: timing fwd ...", flush=True)
    t_fwd = _time_loop(loop_fwd, (params, stats, images), it)
    print(f"  fwd {t_fwd*1e3:.2f} ms; timing fwd+loss ...", flush=True)
    t_loss = _time_loop(loop_loss, (params, stats, images, targets, tmask), it)
    print(f"  fwd+loss {t_loss*1e3:.2f} ms; timing grad ...", flush=True)
    t_grad = _time_loop(loop_grad, (params, stats, images, targets, tmask), it)
    print(f"  grad {t_grad*1e3:.2f} ms; timing full step ...", flush=True)
    t_step = _time_loop(loop_step, (state, images, targets, tmask), it)
    print(f"  full step {t_step*1e3:.2f} ms", flush=True)

    # each probe returns its FULL output pytree — returning only a scalar
    # slice would let XLA dead-code-eliminate the very work being costed
    # (the first run of this tool returned flops=0 for the grad row that way)
    im0 = images_np[0]
    fl_f, by_f = _cost(fwd_only, params, stats, im0)
    fl_l, by_l = _cost(fwd_loss, params, stats, im0, targets_np, tmask_np)
    fl_g, by_g = _cost(grad_fn, params, stats, im0, targets_np, tmask_np)
    fl_s, by_s = _cost(step, state, im0, targets_np, tmask_np)

    comps = [
        {"component": "forward (train, BN stats)", "ms": round(t_fwd * 1e3, 2),
         "gflops": round(fl_f, 1), "gbytes": round(by_f, 2)},
        {"component": "loss (build_targets + EIoU/obj/cls)",
         "ms": round((t_loss - t_fwd) * 1e3, 2),
         "gflops": round(fl_l - fl_f, 1), "gbytes": round(by_l - by_f, 2)},
        {"component": "backward (value_and_grad increment)",
         "ms": round((t_grad - t_loss) * 1e3, 2),
         "gflops": round(fl_g - fl_l, 1), "gbytes": round(by_g - by_l, 2)},
        {"component": "optimizer (clip + SGD + EMA + state plumbing)",
         "ms": round((t_step - t_grad) * 1e3, 2),
         "gflops": round(fl_s - fl_g, 1), "gbytes": round(by_s - by_g, 2)},
    ]
    return {
        "dtype": compute_dtype.__name__,
        "ms_per_step": round(t_step * 1e3, 2),
        "imgs_per_sec_per_chip": round(args.batch / t_step, 1),
        "components_sum_ms": round(t_step * 1e3, 2),  # by construction
        "components": comps,
        "step_gflops": round(fl_s, 1), "step_gbytes": round(by_s, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="lead-yolo")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-targets", type=int, default=64)
    ap.add_argument("--tag", default="r05")
    ap.add_argument("--dtypes", default="bfloat16,float32",
                    help="comma list: bfloat16 (the trainer's default) and/or float32")
    args = ap.parse_args()

    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dmap = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
    results = [measure(args, dmap[d.strip()]) for d in args.dtypes.split(",")]

    # v5e peaks for bound attribution
    peak_tflops_bf16, peak_gbs = 394.0, 820.0
    for r in results:
        for c in r["components"]:
            ms = max(c["ms"], 1e-6)
            c["mfu_pct"] = round(100 * c["gflops"] / ms / peak_tflops_bf16, 1)
            c["hbm_pct"] = round(100 * c["gbytes"] / ms / (peak_gbs / 1e3), 1)

    out = {
        "batch": args.batch, "imgsz": args.imgsz, "cfg": args.cfg, "iters": args.iters,
        "device": str(jax.devices()[0]),
        "harness": "single-dispatch fori_loop, incremental pipeline (components sum to step)",
        "results": results,
        "r04_postmortem": "STEP_RATE_r04's 140.4 ms was an fp32-compute step "
                          "(TrainConfig default) compared against a bf16 forward "
                          "budget; the trainer actually trains bf16 (trainer.py:69)",
    }
    dst = os.path.join(_REPO, "runs", "input_wall", f"STEP_ROOFLINE_{args.tag}.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    for r in results:
        print(f"[step_roofline] {r['dtype']}: {r['ms_per_step']} ms/step "
              f"({r['imgs_per_sec_per_chip']} img/s/chip)")
        for c in r["components"]:
            print(f"    {c['component']:<45} {c['ms']:>8} ms  {c['gflops']:>8} GF "
                  f"{c['gbytes']:>7} GB  MFU {c['mfu_pct']}%  HBM {c['hbm_pct']}%")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
