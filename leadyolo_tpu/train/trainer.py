"""Full training driver: data + model + compiled step + validation + ckpt.

Capability parity with reference train.py:69-446 — the epoch loop, per-epoch
EMA validation, fitness-based best-checkpoint selection, early stopping, csv
logging, warmup bookkeeping — around the single jitted train step. Multi-chip
runs by passing a mesh (the DDP replacement); rank-gating uses
jax.process_index().
"""
from __future__ import annotations

import csv
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..data.datasets import YoloDataset, check_dataset
from ..data.loader import DataLoader
from ..eval.validator import validate
from ..models.yolo import DetectionModel
from ..parallel.mesh import is_main_process, replicate, shard_batch
from ..utils.checkpoint import load_checkpoint, save_checkpoint, strip_optimizer
from .loss import LossConfig
from .optim import EarlyStopping
from .step import TrainConfig, init_train_state, make_train_step

HYP_DIR = Path(__file__).parent.parent / "data" / "hyps"
DATA_DIR = Path(__file__).parent.parent / "data" / "configs"


def load_hyp(hyp) -> dict:
    if isinstance(hyp, dict):
        return dict(hyp)
    p = Path(hyp)
    if not p.exists():
        for cand in (HYP_DIR / f"{hyp}.yaml", HYP_DIR / f"scratch-{hyp}.yaml"):
            if cand.exists():
                p = cand
                break
    with open(p) as f:
        return yaml.safe_load(f)


def resolve_data(data):
    if isinstance(data, dict):  # already-resolved config (tests, evolve loops)
        return data
    p = Path(data)
    if not p.exists():
        for cand in (DATA_DIR / f"{data}.yaml", DATA_DIR / f"{str(data).lower()}.yaml"):
            if cand.exists():
                p = cand
                break
    return check_dataset(p)


def train(
    cfg="lead-yolo",
    data="ssdd",
    hyp="scratch-low",
    epochs: int = 300,
    batch_size: int = 32,
    img_size: int = 640,
    workers: int = 8,
    process_workers: bool = False,
    save_dir="runs/train/exp",
    weights=None,
    compute_dtype=jnp.bfloat16,
    cos_lr: bool = False,
    patience: int = 100,
    val_every: int = 1,
    max_targets: int = 128,
    seed: int = 0,
    mesh=None,
    resume=None,
    noval: bool = False,
    freeze=(),
    multi_scale: bool = False,
    rect: bool = False,
    image_weights: bool = False,
    accumulate: int = -1,
    noautoanchor: bool = False,
    callbacks=None,
    loggers=("csv", "tb"),
    log_fn=print,
):
    """Train a detector; returns (best_fitness, results dict, save_dir)."""
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    hyp = load_hyp(hyp)
    data_cfg = resolve_data(data)
    nc = data_cfg["nc"]

    model = DetectionModel(cfg, nc=nc, img_size=img_size)
    variables = model.init(jax.random.PRNGKey(seed), img_size=img_size)

    if weights:
        # pretrained init (reference train.py:124-133 --weights finetune
        # workflow): params+batch_stats come from the checkpoint — a stripped
        # ckpt's EMA variables, a full train-state, or a reference .pt —
        # while optimizer momentum and EMA restart fresh (use --resume for
        # exact continuation). Same-architecture checkpoints only.
        if str(weights).endswith(".pt"):
            from ..utils.torch_convert import load_reference_checkpoint

            variables, _wmeta, _ = load_reference_checkpoint(model, weights)
        else:
            _wstate, _wmeta = load_checkpoint(weights)
            if isinstance(_wstate, dict) and "ema" in _wstate:
                variables = _wstate["ema"]["variables"]
            elif isinstance(_wstate, dict) and "params" in _wstate:
                variables = {"params": _wstate["params"], "batch_stats": _wstate["batch_stats"]}
            else:
                variables = _wstate
        log_fn(f"pretrained weights from {weights} (epoch {_wmeta.get('epoch', '?')})")

    if rect and multi_scale:
        raise ValueError("--rect and --multi-scale are mutually exclusive (reference train.py:230)")
    if rect and image_weights:
        # weighted sampling reorders rows across aspect buckets, which would
        # mix canvas shapes within a batch (the reference's --image-weights
        # path likewise assumes square training)
        raise ValueError("--rect and --image-weights are mutually exclusive")
    ds = YoloDataset(
        data_cfg["train"], img_size=img_size, augment=True, hyp=hyp, max_targets=max_targets, seed=seed,
        rect=rect, batch_size=batch_size,
    )

    # gradient accumulation to a nominal total batch of 64 (reference
    # train.py:156-158).  The loader yields the full optimizer batch; the
    # jitted step scans over `accumulate` micro-batches of `batch_size`, so
    # peak activation memory stays at one micro-batch.
    if accumulate < 1:
        accumulate = max(round(64 / batch_size), 1)
    # never accumulate past the per-host dataset: total_batch > n would mean
    # ZERO optimizer steps per epoch (silent no-op training on tiny sets)
    n_local = max(len(ds) // max(jax.process_count(), 1), 1)
    accumulate = max(min(accumulate, n_local // max(batch_size, 1)), 1)
    total_batch = batch_size * accumulate
    if rect and total_batch != batch_size:
        # re-bucket so canvas groups align with the full optimizer batch the
        # loader yields (the per-step scan slices micro-batches out of it)
        ds._setup_rect_shapes(total_batch)

    dl = DataLoader(
        ds,
        total_batch,
        # rect buckets are positional: batch k is rows [k*bs, (k+1)*bs) of the
        # aspect-sorted order, so the loader must not shuffle across batches
        # (the reference forces shuffle=False under rect too,
        # utils/dataloaders.py:135-137)
        shuffle=not rect,
        workers=workers,
        seed=seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        # worker processes (reference's N-worker design): removes the GIL
        # ceiling on multi-core hosts; augmentation costs ~14 ms/sample-core
        # (runs/input_wall/INPUT_WALL_r04.json)
        use_processes=process_workers,
    )
    nb = len(dl)  # optimizer steps per epoch
    assert nb > 0, f"batch_size {batch_size} exceeds per-host dataset size {n_local}"
    # warmup spans max(3 epochs, 100 integrated batches) of micro-iterations
    # (reference train.py:251); our step counter counts optimizer steps
    warmup_steps = max(round(hyp.get("warmup_epochs", 3.0) * nb), -(-100 // accumulate))

    if not noautoanchor and model.is_detect:
        # BPR gate + anchor evolution (reference train.py:226-229)
        from ..utils.autoanchor import check_anchors

        new_anchors = check_anchors(ds, model, thr=hyp.get("anchor_t", 4.0), imgsz=img_size, log_fn=log_fn)
        if not np.allclose(new_anchors, model.anchors_px):
            model.anchors_px = new_anchors
            model.anchors_grid = new_anchors / np.asarray(model.strides, np.float32)[:, None, None]

    # weight decay scaled by total-batch/nominal-64 (reference train.py:156-158)
    wd = hyp.get("weight_decay", 5e-4) * total_batch / 64

    lcfg = LossConfig.from_hyp(model, hyp, imgsz=img_size)
    tcfg = TrainConfig(
        loss=lcfg,
        lr0=hyp.get("lr0", 0.01),
        lrf=hyp.get("lrf", 0.01),
        momentum=hyp.get("momentum", 0.937),
        weight_decay=wd,
        warmup_steps=warmup_steps,
        warmup_momentum=hyp.get("warmup_momentum", 0.8),
        warmup_bias_lr=hyp.get("warmup_bias_lr", 0.1),
        epochs=epochs,
        steps_per_epoch=nb,
        cos_lr=cos_lr,
        compute_dtype=compute_dtype,
        freeze=tuple(freeze),
        accumulate=accumulate,
    )
    step = make_train_step(model, tcfg, mesh=mesh)

    # Multi-scale: random resize per batch from a STATIC size bucket
    # (reference train.py:308-313 resizes +-50%; fixed buckets keep XLA
    # recompiles bounded — SURVEY.md §7 hard part 7)
    if multi_scale:
        gs = max(model.strides)
        scale_sizes = sorted({max(int(img_size * r) // gs * gs, gs) for r in (0.5, 0.75, 1.0, 1.25, 1.5)})
        _resize = jax.jit(
            lambda x, s: jnp.clip(
                jax.image.resize(x.astype(jnp.float32), (x.shape[0], s, s, x.shape[3]), "bilinear"), 0, 255
            ).astype(jnp.uint8),
            static_argnums=1,
        )
        import random as _random

        _ms_rng = _random.Random(seed + 1)
    state = init_train_state(variables)
    start_epoch, best_fitness = 0, 0.0

    if resume:
        state, meta = load_checkpoint(resume, target=state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_fitness = float(meta.get("best_fitness", 0.0))
        log_fn(f"resumed from {resume} at epoch {start_epoch}")

    if mesh is not None:
        state = replicate(mesh, state)

    from ..utils.callbacks import Callbacks
    from ..utils.loggers import Loggers

    callbacks = callbacks or Callbacks()
    multiplex = Loggers(save_dir, include=loggers, log_fn=log_fn) if is_main_process() else None
    callbacks.run("on_pretrain_routine_end")
    callbacks.run("on_train_start")

    stopper = EarlyStopping(patience)
    csv_path = save_dir / "results.csv"
    if not csv_path.exists() and is_main_process():
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerow(
                ["epoch", "box_loss", "obj_loss", "cls_loss", "P", "R", "mAP50", "mAP50-95", "lr", "time_s"]
            )

    results = {"mp": 0, "mr": 0, "map50": 0, "map": 0}
    # reused across epochs: without this every in-training validation re-scans
    # the val set and builds a fresh jax.jit (retrace + executable rebuild) —
    # tens of seconds per epoch on remote-compile backends
    val_reuse = {}
    log_fn(f"training {cfg} on {data_cfg.get('train')}: {len(ds)} imgs, {nb} steps/epoch, {epochs} epochs")

    last_per_class = None
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        if image_weights and last_per_class is not None:
            # per-image weights from per-class mAP deficit (reference
            # train.py:275-278 + utils/general.py:712-737)
            cw = (1.0 - last_per_class) ** 2
            iw = np.array(
                [
                    (cw[lb[:, 0].astype(int) % len(cw)].sum() + 1e-3) if len(lb) else 1e-3
                    for lb in ds.labels
                ]
            )
            dl.set_weights(iw)
        dl.set_epoch(epoch)
        # keep metrics as device arrays during the epoch — fetching per step
        # would stall the dispatch pipeline on every iteration
        epoch_metrics = []
        for imgs, targets, tmask in dl:
            x = jnp.asarray(imgs)
            if multi_scale:
                sz = _ms_rng.choice(scale_sizes)
                if sz != x.shape[1]:
                    x = _resize(x, sz)
            batch = (x, jnp.asarray(targets), jnp.asarray(tmask))
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            state, metrics = step(state, *batch)
            epoch_metrics.append(metrics)
        means = {
            k: float(np.mean([np.asarray(m[k]) for m in epoch_metrics])) for k in ("box", "obj", "cls")
        }
        lr_now = float(np.asarray(epoch_metrics[-1]["lr"])) if epoch_metrics else 0.0
        # Per-epoch GC: on the remote-tunnel backend, per-dispatch host/device
        # buffer handles accumulate ~1.8 GB/epoch if left to Python's lazy
        # cycle collector (a 73-epoch run was OOM-killed at 130 GB RSS);
        # collecting each epoch frees them promptly. For bounded-memory runs
        # regardless, use tools/chunked_train.sh (checkpoint-resume chunks).
        epoch_metrics.clear()
        import gc

        gc.collect()

        fi = 0.0
        stop = False
        if is_main_process():
            if not noval and (epoch % val_every == 0 or epoch == epochs - 1):
                # host fetch detaches from the donated step buffers
                ema_vars = jax.tree.map(np.asarray, state.ema.variables)
                results = validate(
                    model,
                    ema_vars,
                    data_cfg["val"],
                    img_size=img_size,
                    batch_size=batch_size,
                    compute_dtype=compute_dtype,
                    max_targets=max_targets,
                    workers=workers,
                    reuse=val_reuse,
                )
                fi = 0.1 * results["map50"] + 0.9 * results["map"]
                if results.get("per_class") is not None:
                    pc = np.zeros(nc)
                    r = results["per_class"]
                    pc[r["unique_classes"]] = r["ap_mean"]
                    last_per_class = pc
            dt = time.time() - t0
            log_fn(
                f"epoch {epoch + 1}/{epochs}: box {means['box']:.4f} obj {means['obj']:.4f} "
                f"cls {means['cls']:.4f} | P {results['mp']:.3f} R {results['mr']:.3f} "
                f"mAP50 {results['map50']:.4f} mAP {results['map']:.4f} | lr {lr_now:.5f} {dt:.1f}s"
            )
            with open(csv_path, "a", newline="") as f:
                csv.writer(f).writerow(
                    [epoch, f"{means['box']:.5f}", f"{means['obj']:.5f}", f"{means['cls']:.5f}",
                     f"{results['mp']:.5f}", f"{results['mr']:.5f}", f"{results['map50']:.5f}",
                     f"{results['map']:.5f}", f"{lr_now:.6f}", f"{dt:.1f}"]
                )

            if multiplex is not None:
                multiplex.log_metrics(
                    {
                        "train/box_loss": means["box"], "train/obj_loss": means["obj"],
                        "train/cls_loss": means["cls"], "metrics/precision": results["mp"],
                        "metrics/recall": results["mr"], "metrics/mAP_0.5": results["map50"],
                        "metrics/mAP_0.5:0.95": results["map"], "x/lr": lr_now,
                    },
                    epoch,
                )
            callbacks.run("on_fit_epoch_end", epoch, results)
            meta = {"epoch": epoch, "best_fitness": max(best_fitness, fi), "cfg": str(cfg), "nc": nc}
            save_checkpoint(save_dir / "last.ckpt", jax.device_get(state), meta)
            callbacks.run("on_model_save", epoch)
            if fi >= best_fitness:
                best_fitness = fi
                save_checkpoint(save_dir / "best.ckpt", jax.device_get(state), meta)

            if stopper(epoch, fi):
                log_fn(f"early stopping at epoch {epoch} (best {stopper.best_fitness:.4f} @ {stopper.best_epoch})")
                stop = True

        # broadcast the stop decision so every process exits the same epoch —
        # otherwise non-main processes hang in the next step's collectives
        # (reference train.py:408-414 broadcast_object_list)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            stop = bool(multihost_utils.broadcast_one_to_all(jnp.asarray(stop)))
        if stop:
            break

    if is_main_process():
        if (save_dir / "best.ckpt").exists():
            strip_optimizer(save_dir / "best.ckpt", save_dir / "best_stripped.ckpt")
        try:  # end-of-run artifacts (reference results.png / PR curves / labels)
            from ..utils.plots import plot_labels, plot_results

            plot_results(csv_path)
            all_labels = np.concatenate([lb for lb in ds.labels if len(lb)]) if any(len(l) for l in ds.labels) else None
            if all_labels is not None:
                plot_labels(all_labels, data_cfg.get("names"), save_dir / "labels.png")
            ema_vars = jax.tree.map(np.asarray, state.ema.variables)
            validate(
                model, ema_vars, data_cfg["val"], img_size=img_size, batch_size=batch_size,
                compute_dtype=compute_dtype, max_targets=max_targets, workers=workers,
                plots_dir=save_dir, names=data_cfg.get("names"), reuse=val_reuse,
            )
        except Exception as e:  # plotting must never fail the run
            log_fn(f"plotting failed: {e}")
        if multiplex is not None:
            multiplex.close()
    dl.close()  # stop worker processes if the process-pool loader was used
    callbacks.run("on_train_end")
    return best_fitness, results, save_dir
