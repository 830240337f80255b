"""ctypes loader for the h36x native runtime library.

Builds lazily with `make` on first use if the .so is missing (g++ is part of
the target image); every entry point has a pure-Python/cv2 fallback, so the
framework works without the native library — just slower on the host path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libh36xio.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libh36xio.so"], cwd=_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable.

    Thread-safe: first use happens from the extraction decode pool (up to
    num_workers threads at once), so build+load is serialized under a lock
    and the Makefile writes via tmp+rename (no torn .so is ever visible).

    The unlocked fast path must only short-circuit on a DEFINITIVE outcome:
    `_tried` is set strictly after `_lib` at the end of `_load_locked`, so a
    racer either sees the final state or takes the lock and blocks until
    the build finishes. (Setting `_tried` before building — the original
    order — let concurrent decode workers fall back to the cv2 path while
    the first caller was still building, which changes resize rounding by
    +-1 u8 and made the first clips of a fresh process nondeterministic.)
    """
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    # make is a no-op when the .so is fresh and rebuilds when the source is
    # newer; fall back to an existing .so if the toolchain is unavailable.
    if not _build() and not _LIB_PATH.exists():
        _tried = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _tried = True
        return None
    lib.h36x_crop_resize_clip_u8.restype = ctypes.c_int
    lib.h36x_crop_resize_clip_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.h36x_hflip_clip_u8.restype = ctypes.c_int
    lib.h36x_hflip_clip_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.h36x_bcs_jitter_u8.restype = ctypes.c_int
    lib.h36x_bcs_jitter_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    try:  # ABI >= 2; a stale .so (failed rebuild) degrades to numpy jitter
        lib.h36x_jitter_clip_u8.restype = ctypes.c_int
        lib.h36x_jitter_clip_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
    except AttributeError:
        lib._h36x_no_full_jitter = True
    _lib = lib
    _tried = True  # after _lib: the unlocked fast path keys on _tried
    return _lib


def available() -> bool:
    return load() is not None


def crop_resize_clip(
    frames: np.ndarray, top: int, left: int, side: int, out_size: int,
    n_threads: int = 4,
) -> np.ndarray:
    """(T,H,W,3) u8 -> (T,out,out,3) u8 square crop + bilinear resize."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    out = np.empty((t, out_size, out_size, 3), np.uint8)
    rc = lib.h36x_crop_resize_clip_u8(
        frames.ctypes.data, t, h, w, int(top), int(left), int(side),
        out.ctypes.data, out_size, n_threads,
    )
    if rc != 0:
        raise ValueError(
            f"invalid crop box (top={top}, left={left}, side={side}) "
            f"for frames {frames.shape}"
        )
    return out


def hflip_clip(frames: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """Horizontally flip (T,H,W,3) u8 frames (returns a new array)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # np.array always copies exactly once; ascontiguousarray(...).copy()
    # would copy twice for strided/non-u8 input
    out = np.array(frames, dtype=np.uint8, order="C")
    t, h, w, _ = out.shape
    lib.h36x_hflip_clip_u8(out.ctypes.data, t, h, w, n_threads)
    return out


def bcs_jitter_clip(
    frames: np.ndarray, fb: float, fc: float, fs: float, order, n_threads: int = 4
) -> np.ndarray:
    """Brightness/contrast/saturation jitter on a copy of (T,H,W,3) u8."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.array(frames, dtype=np.uint8, order="C")
    t, h, w, _ = out.shape
    order_arr = np.ascontiguousarray(order, dtype=np.int32)
    rc = lib.h36x_bcs_jitter_u8(
        out.ctypes.data, t, h, w, float(fb), float(fc), float(fs),
        order_arr.ctypes.data, len(order_arr), n_threads,
    )
    if rc != 0:
        raise ValueError(
            f"bcs_jitter_clip: unknown op in order={list(order_arr)} "
            "(only 0=brightness, 1=contrast, 2=saturation; hue is host-side)"
        )
    return out


def jitter_available() -> bool:
    """True when the full-jitter kernel (ABI >= 2) is loadable."""
    lib = load()
    return lib is not None and not getattr(lib, "_h36x_no_full_jitter", False)


def jitter_clip_u8(frames: np.ndarray, params, n_threads: int = 4) -> np.ndarray:
    """Full 4-op photometric jitter on (T,H,W,3) u8 frames.

    Native mirror of `augment.apply_jitter_params` on `frames/255` followed
    by one round-half-even quantize: the f32 chain (brightness, contrast,
    saturation, HSV hue in the sampled order) runs fused per frame with no
    clip-sized temporaries and releases the GIL across worker threads.
    `params` is a `sample_jitter_params` tuple (order, fb, fc, fs, fh).
    """
    lib = load()
    if lib is None or getattr(lib, "_h36x_no_full_jitter", False):
        raise RuntimeError("native full-jitter kernel unavailable")
    order, fb, fc, fs, fh = params
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    out = np.empty_like(frames)
    order_arr = np.ascontiguousarray(order, dtype=np.int32)
    rc = lib.h36x_jitter_clip_u8(
        frames.ctypes.data, out.ctypes.data, t, h, w,
        float(fb), float(fc), float(fs), float(fh),
        order_arr.ctypes.data, len(order_arr), n_threads,
    )
    if rc != 0:
        raise ValueError(
            f"jitter_clip_u8: unknown op in order={list(order_arr)} "
            "(valid: 0=brightness, 1=contrast, 2=saturation, 3=hue)"
        )
    return out
