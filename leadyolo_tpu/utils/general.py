"""General helpers: paths, size checks, seeding, precision sanity check.

Capability parity with the reference's utils/general.py grab-bag pieces our
stack uses: increment_path (:255), check_img_size (:393), init_seeds,
one_cycle (:681), colorstr (:687), and a TPU-flavored check_amp
(:565-591 — there it compares fp32 vs AMP CUDA detections; here bf16 vs fp32).
"""
from __future__ import annotations

import math
import random
from pathlib import Path

import numpy as np


def increment_path(path, exist_ok=False, sep="", mkdir=False):
    """runs/exp -> runs/exp2, runs/exp3, ... (reference utils/general.py:255)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        stem = path.with_suffix("")
        for n in range(2, 9999):
            p = Path(f"{stem}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def make_divisible(x, divisor=8):
    return math.ceil(x / divisor) * divisor


def check_img_size(imgsz, s=32, floor=0):
    """Round image size to a stride multiple (reference utils/general.py:393)."""
    if isinstance(imgsz, int):
        new = max(make_divisible(imgsz, s), floor)
    else:
        new = [max(make_divisible(x, s), floor) for x in imgsz]
    if new != imgsz:
        print(f"WARNING: --img-size {imgsz} must be multiple of {s}, updating to {new}")
    return new


def init_seeds(seed=0):
    random.seed(seed)
    np.random.seed(seed)


def one_cycle(y1=0.0, y2=1.0, steps=100):
    """Cosine ramp lambda (reference utils/general.py:681)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def colorstr(*input):
    """ANSI color wrapper (reference utils/general.py:687)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_red": "\033[91m", "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + str(string) + colors["end"]


def check_bf16(model, variables, img_size=256, tol=0.1, log_fn=print) -> bool:
    """bf16 sanity check: decoded boxes must stay close to fp32
    (the TPU analogue of the reference's check_amp, utils/general.py:565-591).
    Returns True if bf16 is safe to use."""
    import jax
    import jax.numpy as jnp

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, img_size, img_size, 3), jnp.float32)

    def decoded(dtype):
        p = model.apply(variables, x.astype(dtype), train=False, decode=True)
        return (p[0] if isinstance(p, tuple) else p).astype(jnp.float32)

    a = np.asarray(decoded(jnp.float32))
    b = np.asarray(decoded(jnp.bfloat16))
    # compare top-confidence box agreement
    ia, ib = a[0, :, 4].argmax(), b[0, :, 4].argmax()
    same_argmax = ia == ib
    box_close = np.allclose(a[0, ia, :4], b[0, ib, :4], rtol=tol, atol=img_size * 0.02)
    ok = bool(same_argmax and box_close)
    log_fn(f"bf16 check: {'PASS' if ok else 'FAIL — falling back to fp32'}")
    return ok


class TryExcept:
    """Context/decorator that logs and swallows exceptions
    (reference utils/__init__.py:16-27)."""

    def __init__(self, msg=""):
        self.msg = msg

    def __call__(self, fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*a, **k):
            with self:
                return fn(*a, **k)

        return wrapper

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if value:
            print(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


def threaded(fn):
    """Run a function in a daemon thread (reference utils/__init__.py:30-37)."""
    import threading

    def wrapper(*a, **k):
        t = threading.Thread(target=fn, args=a, kwargs=k, daemon=True)
        t.start()
        return t

    return wrapper
