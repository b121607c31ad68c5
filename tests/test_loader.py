"""DataLoader: shuffling, sharding, weighted sampling, prefetch."""
import numpy as np

from leadyolo_tpu.data.loader import DataLoader


class ToyDataset:
    def __init__(self, n=20, t=4):
        self.n, self.t = n, t
        self.labels = [np.zeros((1, 5), np.float32) for _ in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((8, 8, 3), i, np.uint8)
        return img, np.array([[0, 0.5, 0.5, 0.2, 0.2]], np.float32)

    def collate(self, samples):
        imgs = np.stack([s[0] for s in samples])
        targets = np.zeros((len(samples), self.t, 5), np.float32)
        tmask = np.zeros((len(samples), self.t), bool)
        for i, (_, lb) in enumerate(samples):
            targets[i, : len(lb)] = lb
            tmask[i, : len(lb)] = True
        return imgs, targets, tmask


def _seen_ids(dl):
    out = []
    for imgs, _, _ in dl:
        out.extend(imgs[:, 0, 0, 0].tolist())
    return out


def test_epoch_shuffling_deterministic():
    ds = ToyDataset()
    dl = DataLoader(ds, batch_size=4, seed=1, workers=2)
    a = _seen_ids(dl)
    b = _seen_ids(dl)  # same epoch -> same order
    assert a == b
    dl.set_epoch(1)
    c = _seen_ids(dl)
    assert a != c and sorted(a) == sorted(c)


def test_process_sharding_disjoint():
    ds = ToyDataset()
    d0 = DataLoader(ds, batch_size=2, seed=0, workers=1, process_index=0, process_count=2)
    d1 = DataLoader(ds, batch_size=2, seed=0, workers=1, process_index=1, process_count=2)
    s0, s1 = set(_seen_ids(d0)), set(_seen_ids(d1))
    assert not (s0 & s1)
    assert len(s0) + len(s1) == 20


def test_rect_batches_equal_per_process():
    """Rect mode must hand every host the SAME number of (whole-bucket)
    batches — an uneven split would strand one host in a psum its peers
    never join. 20 imgs / bs 2 = 10 batches over 3 hosts: padded to 12."""
    ds = ToyDataset(n=20)
    ds.batch_shapes = [(8, 8)] * 10  # marks the dataset as rect-bucketed
    lens = []
    for pi in range(3):
        dl = DataLoader(ds, batch_size=2, shuffle=False, workers=1,
                        process_index=pi, process_count=3)
        lens.append(len(dl._rect_batches()))
    assert lens == [4, 4, 4]
    # padding wraps around to the first buckets, never invents indices
    flat = [i for pi in range(3)
            for b in DataLoader(ds, batch_size=2, shuffle=False, workers=1,
                                process_index=pi, process_count=3)._rect_batches()
            for i in b]
    assert set(flat) == set(range(20))
    # single host: unchanged, no padding
    solo = DataLoader(ds, batch_size=2, shuffle=False, workers=1)
    assert len(solo._rect_batches()) == 10


def test_weighted_sampling_biases():
    ds = ToyDataset()
    dl = DataLoader(ds, batch_size=4, seed=0, workers=1)
    w = np.ones(20)
    w[7] = 200.0
    dl.set_weights(w)
    ids = _seen_ids(dl)
    assert ids.count(7) > len(ids) // 3  # heavily over-sampled


def test_drop_last_and_len():
    ds = ToyDataset(n=10)
    assert len(DataLoader(ds, batch_size=4, drop_last=True)) == 2
    assert len(DataLoader(ds, batch_size=4, drop_last=False)) == 3


def test_process_pool_loader_matches_thread_loader(tmp_path):
    """use_processes=True (the reference's N-worker-process design): same
    batch order and content as the thread path for a non-augmenting dataset,
    deterministic across epochs, ordered yield despite worker races."""
    import cv2

    from leadyolo_tpu.data.datasets import YoloDataset

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(12):
        cv2.imwrite(str(img_dir / f"{i}.png"), rng.integers(0, 256, (80, 80, 3), np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

    def batches(use_processes):
        ds = YoloDataset(img_dir, img_size=96, augment=False, max_targets=4)
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=3, workers=3,
                        use_processes=use_processes)
        try:
            out = [tuple(np.asarray(a).copy() for a in b) for b in dl]
        finally:
            dl.close() if use_processes else None
        return out

    a = batches(False)
    b = batches(True)
    assert len(a) == len(b) == 3
    for (ia, ta, ma), (ib, tb, mb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)
        np.testing.assert_array_equal(ma, mb)


def test_process_pool_loader_survives_worker_death(tmp_path):
    """Killing a worker mid-epoch must not hang or lose a batch: liveness is
    checked on every wait, the dead worker is replaced in place, and every
    outstanding batch is resubmitted."""
    import cv2

    from leadyolo_tpu.data.datasets import YoloDataset

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(24):
        cv2.imwrite(str(img_dir / f"{i}.png"), np.full((64, 64, 3), i * 10, np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    ds = YoloDataset(img_dir, img_size=64, augment=False, max_targets=4)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0, workers=2, use_processes=True)
    try:
        it = iter(dl)
        got = [next(it)]
        dl._pool[0].terminate()  # SIGTERM one worker, possibly mid-batch
        dl._pool[0].join()
        got.extend(it)  # must complete all 6 batches, not hang or raise
        assert len(got) == 6
        assert all(p.is_alive() for p in dl._pool)  # fleet revived in place
        # batches are the same the healthy path would have produced
        healthy = list(DataLoader(ds, batch_size=4, shuffle=True, seed=0, workers=2))
        for (ia, ta, ma), (ib, tb, mb) in zip(got, healthy):
            np.testing.assert_array_equal(np.asarray(ia), ib)
    finally:
        dl.close()


def test_process_pool_loader_discards_stale_after_abandoned_iter(tmp_path):
    """Breaking out of an epoch mid-iteration must not leak that epoch's
    batches into the next one (generation tagging)."""
    import cv2

    from leadyolo_tpu.data.datasets import YoloDataset

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(12):
        cv2.imwrite(str(img_dir / f"{i}.png"), np.full((64, 64, 3), i * 20, np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    ds = YoloDataset(img_dir, img_size=64, augment=False, max_targets=4)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0, workers=2, use_processes=True)
    try:
        it = iter(dl)
        first = next(it)  # abandon after one batch; tasks for 2 more in flight
        del it
        full = [b[0].copy() for b in dl]  # fresh iteration, same epoch seed
        ref_first = first[0]
        np.testing.assert_array_equal(full[0], ref_first)  # deterministic restart
        assert len(full) == 3
    finally:
        dl.close()
