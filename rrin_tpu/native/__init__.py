"""ctypes bindings for the native host-path library (framepack.cpp).

Builds ``libframepack.so`` with g++ on first use (cached next to the
source; no pybind11 in this environment — plain C ABI + ctypes per the
build rules). Falls back to numpy transparently when no toolchain exists,
so the pipeline never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "framepack.cpp")
_SO = os.path.join(_DIR, "libframepack.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.rrin_swap_rb_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ]
            lib.rrin_pack_pair_bgr.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def swap_rb(frame: np.ndarray, threads: int = 4) -> np.ndarray:
    """BGR<->RGB for a contiguous uint8 HWC image (returns a new array)."""
    lib = _load()
    if lib is None or frame.dtype != np.uint8 or not frame.flags.c_contiguous:
        return np.ascontiguousarray(frame[:, :, ::-1])
    out = np.empty_like(frame)
    lib.rrin_swap_rb_u8(
        frame.ctypes.data, out.ctypes.data,
        frame.shape[0] * frame.shape[1], threads,
    )
    return out


def pack_pair_bgr(
    prev_bgr: np.ndarray, cur_bgr: np.ndarray, batch: np.ndarray, slot: int,
    threads: int = 4,
) -> bool:
    """Pack a BGR pair into batch[slot] (a (B,2,H,W,3) uint8 buffer) as RGB.

    Returns False (caller should use the numpy path) when unavailable.
    """
    lib = _load()
    if (
        lib is None
        or prev_bgr.dtype != np.uint8
        or not (prev_bgr.flags.c_contiguous and cur_bgr.flags.c_contiguous
                and batch.flags.c_contiguous)
    ):
        return False
    frame_bytes = prev_bgr.nbytes
    lib.rrin_pack_pair_bgr(
        prev_bgr.ctypes.data, cur_bgr.ctypes.data, batch.ctypes.data,
        slot, frame_bytes, threads,
    )
    return True
