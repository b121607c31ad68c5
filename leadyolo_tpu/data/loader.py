"""Threaded prefetching batch loader feeding the TPU.

The reference uses torch's multi-process DataLoader with an infinite
repeating sampler (utils/dataloaders.py:103-187). Here: a thread pool decodes
and augments on the host while the device computes, with per-epoch seeded
shuffling and per-host sharding (the DistributedSampler equivalent —
each JAX process takes a disjoint strided slice, reference
utils/dataloaders.py:141).
"""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


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
        self.weights = None  # optional per-image sampling weights

    def set_weights(self, weights):
        """Per-image sampling weights for the next epochs (the reference's
        --image-weights mAP-deficit sampling, train.py:275-278)."""
        self.weights = None if weights is None else np.asarray(weights, np.float64)

    def __len__(self):
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

    def __iter__(self):
        idx = self._local_indices()
        nb = len(self)
        batches = [idx[i * self.bs : (i + 1) * self.bs] for i in range(nb)]

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
