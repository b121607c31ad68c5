"""Hyperparameter evolution (GA) — reference train.py:546-636 semantics."""
import numpy as np

from leadyolo_tpu.train.evolve import HYP_META, evolve, mutate


def test_mutate_respects_bounds(rng):
    hyp = {k: (lo + hi) / 2 for k, (_, lo, hi) in HYP_META.items()}
    for _ in range(20):
        hyp = mutate(hyp, [], np.random.default_rng(1))
        for k, v in hyp.items():
            _, lo, hi = HYP_META[k]
            assert lo <= v <= hi, (k, v)


def test_evolve_improves_toy_objective(tmp_path):
    # fitness peaks at lr0 = 0.05; GA should move toward it
    base = {"lr0": 0.001, "momentum": 0.9}

    def train_fn(hyp):
        return 1.0 - abs(hyp["lr0"] - 0.05)

    best = evolve(base, train_fn, generations=25, save_dir=tmp_path, seed=3, log_fn=lambda *a: None)
    assert abs(best["lr0"] - 0.05) < abs(base["lr0"] - 0.05)
    assert (tmp_path / "evolve.csv").exists()
