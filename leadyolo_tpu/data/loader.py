"""Threaded / multi-process prefetching batch loader feeding the TPU.

The reference uses torch's multi-process DataLoader with an infinite
repeating sampler (utils/dataloaders.py:103-187). Here, two modes:

- threads (default): a thread pool decodes and augments on the host while
  the device computes. The eval path is GIL-free (native C++ letterbox) and
  scales; the augmenting TRAIN path hits a GIL wall at ~46 img/s regardless
  of thread count (runs/input_wall/INPUT_WALL_r04.json) — mosaic/perspective
  spend too much time in numpy glue between the cv2 calls that do release
  the GIL.
- use_processes=True: persistent spawn-based worker processes, the
  reference's N-worker-process design. Workers rebuild the dataset from a
  pickle (spawn, not fork — forking a process with a live TPU client is
  unsafe), never import jax, and re-seed per (epoch, batch) so augmentation
  is deterministic regardless of worker assignment. Parent keeps a bounded
  task window in flight and reorders results.

Both modes share per-epoch seeded shuffling and per-host sharding (the
DistributedSampler equivalent — each JAX process takes a disjoint strided
slice, reference utils/dataloaders.py:141).
"""
from __future__ import annotations

import multiprocessing as mp
import pickle
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _proc_worker(ds_bytes: bytes, seed: int, task_q, out_q):
    """Worker-process loop: rebuild the dataset once, then build batches.

    Lives at module top level so the spawn context can import it; must stay
    jax-free (leadyolo_tpu.data imports only cv2/numpy)."""
    ds = pickle.loads(ds_bytes)
    while True:
        task = task_q.get()
        if task is None:
            return
        gen, epoch, bi, idxs = task
        # deterministic augmentation independent of which worker runs the
        # batch (the thread path mutates one shared rng; here each batch
        # owns a stream keyed by (seed, epoch, batch))
        ds.rng = random.Random((seed * 1_000_003 + epoch) * 1_000_003 + bi)
        try:
            samples = [ds[i] for i in idxs]
            out_q.put((gen, bi, ds.collate(samples), None))
        except Exception as e:  # surface the error in the parent, keep serving
            out_q.put((gen, bi, None, repr(e)))


def _shutdown_pool(pool, task_q):
    """Terminate worker processes; module-level so weakref.finalize can hold
    it without keeping the DataLoader alive."""
    for _ in pool:
        try:
            task_q.put_nowait(None)
        except Exception:
            break
    for p in pool:
        p.join(timeout=2)
        if p.is_alive():
            p.terminate()


class DataLoader:
    """Iterates fixed-shape (images, targets, tmask) numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        use_processes: bool = False,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = workers
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self.use_processes = use_processes
        self._pool = None  # persistent worker processes (reference's worker reuse)
        self.weights = None  # optional per-image sampling weights

    def set_weights(self, weights):
        """Per-image sampling weights for the next epochs (the reference's
        --image-weights mAP-deficit sampling, train.py:275-278)."""
        self.weights = None if weights is None else np.asarray(weights, np.float64)

    def _rect_batches(self):
        """Whole aspect-ratio buckets per batch (dataset rows are sorted and
        grouped by `batch_index`); multi-host sharding hands out whole
        batches, never strided rows — a strided slice would mix buckets with
        different canvas shapes in one batch and break collate's np.stack.

        The batch list is padded (wrap-around repeat, DistributedSampler's
        padding rule, reference utils/dataloaders.py:141) to a multiple of
        process_count so every host yields the SAME number of batches per
        epoch — an uneven split would leave one host blocking in a per-step
        psum its peers never join."""
        n = len(self.ds)
        nb = n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs
        batches = [list(range(i * self.bs, min((i + 1) * self.bs, n))) for i in range(nb)]
        if self.process_count > 1 and batches:
            rem = len(batches) % self.process_count
            if rem:
                batches = batches + batches[: self.process_count - rem]
        return batches[self.process_index :: self.process_count]

    def _is_rect(self):
        return getattr(self.ds, "batch_shapes", None) is not None

    def __len__(self):
        if self._is_rect():
            return len(self._rect_batches())
        n = len(self._local_indices())
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def set_epoch(self, epoch: int):
        """Reshuffle seed per epoch (reference train.py:281-282 sampler.set_epoch)."""
        self.epoch = epoch

    def _local_indices(self):
        n = len(self.ds)
        if self.weights is not None:
            rng = np.random.default_rng(self.seed + self.epoch)
            p = self.weights / self.weights.sum()
            idx = rng.choice(n, size=n, replace=True, p=p).tolist()
        else:
            idx = list(range(n))
            if self.shuffle:
                random.Random(self.seed + self.epoch).shuffle(idx)
        return idx[self.process_index :: self.process_count]

    # ---- worker-process mode (reference utils/dataloaders.py N workers) ----

    def _ensure_pool(self):
        if self._pool is not None:
            return
        if self.workers < 1:
            raise ValueError(
                f"use_processes=True needs workers >= 1 (got {self.workers}); "
                "use the thread path for in-process loading"
            )
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._out_q = ctx.Queue()
        self._ds_bytes = pickle.dumps(self.ds)
        self._pool = [
            ctx.Process(
                target=_proc_worker,
                args=(self._ds_bytes, self.seed, self._task_q, self._out_q),
                daemon=True,
            )
            for _ in range(self.workers)
        ]
        for p in self._pool:
            p.start()
        # If the loader is abandoned without close() (e.g. an exception
        # unwinds past the trainer), reclaim the workers at GC instead of
        # leaking a fleet per retry in long-lived parent processes
        import weakref

        self._finalizer = weakref.finalize(self, _shutdown_pool, self._pool, self._task_q)

    def close(self):
        """Stop worker processes (daemonic, so also die with the parent)."""
        if self._pool is not None:
            f = getattr(self, "_finalizer", None)
            if f is not None:
                f()  # runs _shutdown_pool exactly once
            else:
                _shutdown_pool(self._pool, self._task_q)
            self._pool = None

    def _revive_dead_workers(self, reorder, next_yield, next_submit, batches):
        """Replace dead workers and resubmit their possibly-lost batches.

        A worker that dies mid-batch (OOM-kill) takes its task with it; the
        parent can't know which task was lost, so it resubmits every
        outstanding batch not yet received. Duplicates from tasks still being
        chewed by live workers are harmless — reorder is keyed by batch index.
        Returns the number of workers revived (0 = fleet healthy)."""
        dead = [i for i, p in enumerate(self._pool) if not p.is_alive()]
        if not dead:
            return 0
        ctx = mp.get_context("spawn")
        for i in dead:
            p = ctx.Process(
                target=_proc_worker,
                args=(self._ds_bytes, self.seed, self._task_q, self._out_q),
                daemon=True,
            )
            p.start()
            self._pool[i] = p  # mutate in place: the GC finalizer holds this list
        for bi in range(next_yield, next_submit):
            if bi not in reorder:
                self._task_q.put((self._gen, self.epoch, bi, batches[bi]))
        return len(dead)

    def _iter_processes(self, batches):
        self._ensure_pool()
        # generation counter: results from an abandoned earlier iteration
        # (a consumer that broke out mid-epoch) still sitting in out_q must
        # not be mistaken for this epoch's batches
        self._gen = getattr(self, "_gen", 0) + 1
        window = self.workers + self.prefetch  # bounded tasks in flight
        reorder = {}
        next_submit = next_yield = 0
        revived = 0
        while next_yield < len(batches):
            while next_submit < len(batches) and next_submit - next_yield < window:
                self._task_q.put((self._gen, self.epoch, next_submit, batches[next_submit]))
                next_submit += 1
            while next_yield not in reorder:
                # liveness check on EVERY wait, not only after a long silence:
                # one dead worker among live producers keeps out_q busy, so a
                # timeout alone would never notice the lost batch
                revived += self._revive_dead_workers(reorder, next_yield, next_submit, batches)
                if revived > 3 * self.workers:
                    raise RuntimeError(
                        f"loader workers keep dying ({revived} revivals this epoch; "
                        "OOM/kill?) — lower workers or batch size"
                    )
                try:
                    gen, bi, batch, err = self._out_q.get(timeout=5)
                except queue.Empty:
                    continue  # loop re-checks liveness, resubmits if needed
                if gen != self._gen:
                    continue  # stale result from an abandoned iteration
                if err is not None:
                    raise RuntimeError(f"loader worker failed on batch {bi}: {err}")
                reorder[bi] = batch
            yield reorder.pop(next_yield)
            next_yield += 1

    def __iter__(self):
        if self._is_rect():
            if self.weights is not None:
                raise ValueError("rect bucketing is incompatible with weighted sampling")
            batches = self._rect_batches()
        else:
            idx = self._local_indices()
            nb = len(self)
            batches = [idx[i * self.bs : (i + 1) * self.bs] for i in range(nb)]

        if self.use_processes:
            yield from self._iter_processes(batches)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        use_fast = getattr(self.ds, "batch_fastpath", False)

        def produce():
            with ThreadPoolExecutor(max_workers=self.workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    if use_fast:
                        # eval: threaded decode + one GIL-free native
                        # letterbox pass into the batch slab
                        out_q.put(self.ds.get_eval_batch(b, pool))
                    else:
                        samples = list(pool.map(self.ds.__getitem__, b))
                        out_q.put(self.ds.collate(samples))
            out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
