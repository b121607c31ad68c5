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
