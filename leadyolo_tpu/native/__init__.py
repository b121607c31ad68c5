"""ctypes bindings for the native preprocessing engine (preproc.cpp).

Compiles the shared library on first use (g++ is part of the environment) and
caches it next to the source; every entry point has a pure-Python/cv2
fallback so the package works even without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libpreproc.so"
_SRC = _DIR / "preproc.cpp"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            # portable baseline (no -march=native): the .so may be cached on a
            # shared filesystem and loaded by heterogeneous hosts — an
            # AVX-512-tuned artifact would SIGILL on an older core
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.resize_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.assemble_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return lib
    except OSError:
        _lib = False
        return None


def letterbox_batch_native(images, out_size, swap_rb=True, scaleup=False, num_threads=None):
    """Letterbox a list of HWC uint8 BGR images into one (n, oh, ow, 3) uint8
    batch (RGB when swap_rb). ``out_size`` is an int (square) or (h, w).
    Returns (batch, geom (n,3) [gain, dw, dh]) or None if the native library
    is unavailable. When every source already fits the canvas (gain == 1, the
    eval pipeline after load_image pre-resize), the output is a bit-exact
    pad+swap copy of the cv2 path."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(images)
    oh, ow = (int(out_size), int(out_size)) if np.isscalar(out_size) else (int(out_size[0]), int(out_size[1]))
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    shapes = np.array([im.shape[:2] for im in images], np.int32).ravel()
    batch = np.empty((n, oh, ow, 3), np.uint8)
    geom = np.empty((n, 3), np.float32)
    nt = num_threads or min(os.cpu_count() or 8, n)
    lib.letterbox_batch(
        ptrs,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        batch.ctypes.data_as(ctypes.c_void_p),
        oh,
        ow,
        int(swap_rb),
        int(scaleup),
        geom.ctypes.data_as(ctypes.c_void_p),
        nt,
    )
    return batch, geom


def assemble_tiles_native(tiles, canvas_hw, fill=114):
    """Assemble mosaic tiles into a fresh (H, W, 3) uint8 canvas, GIL-free.

    ``tiles``: list of (img HWC uint8, (dy, dx, sy, sx, h, w)) — copy
    img[sy:sy+h, sx:sx+w] to canvas[dy:dy+h, dx:dx+w]. Returns the canvas, or
    None if the native library is unavailable (caller falls back to numpy).
    The numpy equivalent (np.full + slice assignments) holds the GIL and was
    the cap on the augmenting loader's thread scaling."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(tiles)
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im, _ in tiles]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data_as(ctypes.c_void_p).value for im in imgs])
    shapes = np.array([im.shape[:2] for im in imgs], np.int32).ravel()
    rects = np.array([r for _, r in tiles], np.int32).ravel()
    h, w = int(canvas_hw[0]), int(canvas_hw[1])
    canvas = np.empty((h, w, 3), np.uint8)
    lib.assemble_tiles(
        ptrs,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        canvas.ctypes.data_as(ctypes.c_void_p),
        h,
        w,
        int(fill),
    )
    return canvas
