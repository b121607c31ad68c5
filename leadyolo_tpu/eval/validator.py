"""Validation engine: device-side forward+decode+NMS, host-side AP bookkeeping.

Capability parity with reference val.py:104-346: rect aspect-ratio-bucketed
dataloader (pad 0.5), conf 0.001 / IoU 0.6 multi-label NMS, greedy IoU
matching at 10 thresholds, ap_per_class, per-class table, native-space COCO
JSON records, speed/FPS accounting. TPU-first: one jitted graph per bucket
shape (a small closed set — rect bucketing maps to static shapes instead of
arbitrary per-batch sizes) runs forward+decode+NMS for the whole batch;
matching happens in letterbox space (IoU is invariant under the per-image
uniform scale+pad, so native-space matching like the reference's scale_boxes
path gives identical TPs).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import YoloDataset
from ..data.loader import DataLoader
from ..ops.metrics import ap_per_class, ConfusionMatrix, process_batch
from ..ops.nms import non_max_suppression
from ..parallel.mesh import batch_sharding, replicate


def validate(
    model,
    variables,
    data_path,
    img_size: int = 640,
    batch_size: int = 32,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_nms: int = 4096,
    compute_dtype=jnp.bfloat16,
    max_targets: int = 128,
    names: Optional[dict] = None,
    verbose: bool = False,
    workers: int = 8,
    save_json: Optional[str] = None,
    plots_dir: Optional[str] = None,
    augment: bool = False,
    rect: bool = True,
    reuse: Optional[dict] = None,
    mesh=None,
):
    """Evaluate mAP on a directory/txt of YOLO-format images.

    Returns dict(mp, mr, map50, map, per_class, speed_ms, fps, nt).

    ``reuse``: a caller-owned dict caching the dataset, loader, and jitted
    infer fn across calls. The in-training validator calls this every epoch —
    without reuse each call re-scans labels and builds a FRESH jax.jit object
    (full retrace + executable rebuild), which dominates epoch time on
    remote-compile backends.

    ``mesh``: a ``jax.sharding.Mesh`` for data-parallel multi-chip inference
    (the eval counterpart of the trainer's DP mesh — the reference has no
    distributed val at all, its val always runs on one device,
    reference val.py:122-126). Batches are sharded on the leading dim,
    params replicated; XLA partitions the whole forward+decode+NMS graph so
    throughput scales with chip count over ICI. Requires
    batch_size % n_devices == 0 (batches are already padded static).
    """
    nc = model.nc
    iouv = np.linspace(0.5, 0.95, 10)
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        if batch_size % n_dev:
            raise ValueError(f"batch_size {batch_size} not divisible by mesh size {n_dev}")
        variables = replicate(mesh, variables)
        _in_sharding = batch_sharding(mesh)

    key = (str(data_path), img_size, batch_size, rect, augment, str(compute_dtype),
           max_targets, conf_thres, iou_thres, max_det, max_nms, workers, mesh)
    if reuse is not None and reuse.get("key") == key:
        ds, dl, infer = reuse["ds"], reuse["dl"], reuse["infer"]
    else:
        ds = YoloDataset(
            data_path,
            img_size=img_size,
            augment=False,
            max_targets=max_targets,
            rect=rect,
            batch_size=batch_size,
            pad=0.5 if rect else 0.0,  # reference val.py:182-190
            return_shapes=True,
        )
        dl = DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False, workers=workers)

        @jax.jit
        def infer(variables, images):
            x = images.astype(compute_dtype) / 255.0
            if augment:  # TTA: scale+flip ensemble (reference val.py --augment)
                preds = model.apply_augmented(variables, x)
            else:
                preds = model.apply(variables, x, train=False, decode=True)
            if isinstance(preds, tuple):
                preds = preds[0]
            det, valid, _ = non_max_suppression(
                preds.astype(jnp.float32),
                conf_thres=conf_thres,
                iou_thres=iou_thres,
                multi_label=nc > 1,
                max_det=max_det,
                max_nms=max_nms,
                nc=nc,
            )
            return det, valid

        if reuse is not None:
            reuse.update(key=key, ds=ds, dl=dl, infer=infer)

    stats = []
    confusion = ConfusionMatrix(nc)
    seen = 0
    infer_time = 0.0
    timed_images = 0
    compiled_shapes = set()
    kept_batches = {}
    json_records = []

    for imgs, targets, tmask, metas in dl:
        b = imgs.shape[0]
        if b < batch_size:  # pad the final batch to keep the jit shape static
            pad_n = batch_size - b
            imgs = np.concatenate([imgs, np.zeros((pad_n,) + imgs.shape[1:], imgs.dtype)])
        canvas_h, canvas_w = imgs.shape[1:3]

        first_of_shape = imgs.shape[1:3] not in compiled_shapes
        compiled_shapes.add(imgs.shape[1:3])
        t0 = time.perf_counter()
        if mesh is not None:
            imgs_dev = jax.device_put(imgs, _in_sharding)
        else:
            imgs_dev = jnp.asarray(imgs)
        det, valid = infer(variables, imgs_dev)
        det = np.asarray(det)  # host fetch forces completion
        valid = np.asarray(valid)
        dt = time.perf_counter() - t0
        if not first_of_shape:  # don't bill XLA compile time as inference
            # scale batch time by its real-image fraction (final batch is padded)
            infer_time += dt * (b / batch_size)
            timed_images += b
            kept_batches.clear()
        elif timed_images == 0:
            # no untainted batch yet: remember one batch per shape so we can
            # re-time it post-compile if the whole run is single-batch buckets
            kept_batches[imgs.shape[1:3]] = (imgs, b)

        for i in range(b):
            seen += 1
            d = det[i][valid[i]]
            lb = targets[i][tmask[i]]
            # labels to xyxy pixel space (same letterbox space as predictions)
            tbox = np.zeros((len(lb), 5), np.float32)
            if len(lb):
                tbox[:, 0] = lb[:, 0]
                cx, cy = lb[:, 1] * canvas_w, lb[:, 2] * canvas_h
                w, h = lb[:, 3] * canvas_w, lb[:, 4] * canvas_h
                tbox[:, 1], tbox[:, 2], tbox[:, 3], tbox[:, 4] = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
            correct = process_batch(d, tbox, iouv)
            stats.append((correct, d[:, 4], d[:, 5], tbox[:, 0]))
            confusion.process_batch(d, tbox)
            if save_json is not None and len(d):
                # COCO records in NATIVE image space (reference val.py:313-336
                # save_one_json): undo the letterbox, then corner-xywh format
                h0, w0, rh, rw, padw, padh = metas[i]
                nat = d.copy()
                nat[:, [0, 2]] = ((nat[:, [0, 2]] - padw) / rw).clip(0, w0)
                nat[:, [1, 3]] = ((nat[:, [1, 3]] - padh) / rh).clip(0, h0)
                stem = Path(ds.im_files[seen - 1]).stem
                image_id = int(stem) if stem.isnumeric() else stem
                for x1, y1, x2, y2, conf, cls in nat:
                    json_records.append(
                        {
                            "image_id": image_id,
                            "category_id": int(cls),
                            "bbox": [round(float(x1), 3), round(float(y1), 3),
                                     round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                            "score": round(float(conf), 5),
                        }
                    )

    tp = np.concatenate([s[0] for s in stats]) if stats else np.zeros((0, 10), bool)
    conf = np.concatenate([s[1] for s in stats]) if stats else np.zeros(0)
    pred_cls = np.concatenate([s[2] for s in stats]) if stats else np.zeros(0)
    target_cls = np.concatenate([s[3] for s in stats]) if stats else np.zeros(0)

    if tp.shape[0] and target_cls.shape[0]:
        r = ap_per_class(tp, conf, pred_cls, target_cls)
        mp, mr = float(r["p"].mean()), float(r["r"].mean())
        map50, mapm = float(r["ap50"].mean()), float(r["ap_mean"].mean())
    else:
        r = None
        mp = mr = map50 = mapm = 0.0

    if timed_images == 0 and kept_batches:
        # every bucket had exactly one (compile-tainted) batch: re-run each
        # kept batch once — already compiled — for an untainted speed number
        for imgs_k, b_k in kept_batches.values():
            t0 = time.perf_counter()
            imgs_k = jax.device_put(imgs_k, _in_sharding) if mesh is not None else jnp.asarray(imgs_k)
            det_k, valid_k = infer(variables, imgs_k)
            np.asarray(det_k), np.asarray(valid_k)
            infer_time += (time.perf_counter() - t0) * (b_k / batch_size)
            timed_images += b_k
    speed_ms = infer_time / max(timed_images, 1) * 1000.0
    out = {
        "mp": mp,
        "mr": mr,
        "map50": map50,
        "map": mapm,
        "nt": int(target_cls.shape[0]),
        "seen": seen,
        "speed_ms": speed_ms,
        "fps": 1000.0 / speed_ms if speed_ms else 0.0,
        "per_class": r,
        "confusion": confusion,
        "dataset": ds,  # for GT-record building (cocoeval) without a rescan
    }
    if save_json is not None:
        import json as _json

        Path(save_json).parent.mkdir(parents=True, exist_ok=True)
        Path(save_json).write_text(_json.dumps(json_records))
    if plots_dir is not None and r is not None:
        from ..utils.plots import plot_confusion_matrix, plot_mc_curve, plot_pr_curve

        pd = Path(plots_dir)
        pd.mkdir(parents=True, exist_ok=True)
        plot_pr_curve(r["px"], r["pr_curve"], r["ap"], pd / "PR_curve.png", names)
        plot_mc_curve(r["px"], r["f1_curve"], pd / "F1_curve.png", names, ylabel="F1")
        plot_mc_curve(r["px"], r["p_curve"], pd / "P_curve.png", names, ylabel="Precision")
        plot_mc_curve(r["px"], r["r_curve"], pd / "R_curve.png", names, ylabel="Recall")
        plot_confusion_matrix(confusion, names, pd / "confusion_matrix.png")
    if verbose:
        print(f"{'all':>10}{seen:>9}{out['nt']:>9}{mp:>11.3g}{mr:>11.3g}{map50:>11.3g}{mapm:>11.3g}")
        if r is not None and nc > 1 and names:
            for ci, c in enumerate(r["unique_classes"]):
                print(
                    f"{names.get(int(c), c):>10}{seen:>9}{int((target_cls == c).sum()):>9}"
                    f"{r['p'][ci]:>11.3g}{r['r'][ci]:>11.3g}{r['ap50'][ci]:>11.3g}{r['ap_mean'][ci]:>11.3g}"
                )
    return out
