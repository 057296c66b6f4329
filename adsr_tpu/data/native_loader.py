"""ctypes binding for the native C++ data loader (native/adsr_native.cpp).

Builds the shared library on first use (g++ -O3, links libpng/zlib) and
exposes:
- ``decode_png(path)`` -> uint8 [H, W, 3]
- ``resize_lanczos(img, out_h, out_w)`` -> uint8 (Pillow-parity Lanczos-3)
- ``load_batch(paths, out_h, out_w, threads)`` -> uint8 [N, out_h, out_w, 3]
  (threaded decode+resize — the reference's sequential PIL loop equivalent)

``available()`` gates every call; all users keep a PIL fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _build(src: Path, out: Path) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src),
           "-o", str(out), "-lpng", "-lz", "-pthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0 and out.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _repo_root() / "native" / "adsr_native.cpp"
    so = _repo_root() / "native" / "libadsr_native.so"
    if not so.exists() or (src.exists()
                           and src.stat().st_mtime > so.stat().st_mtime):
        if not src.exists() or not _build(src, so):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.adsr_decode_png.argtypes = [ctypes.c_char_p, u8p, ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_int]
    lib.adsr_resize_lanczos.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, u8p, ctypes.c_int,
                                        ctypes.c_int]
    lib.adsr_load_batch.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, u8p,
                                    ctypes.c_int]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_png(path: str, max_dim: int = 8192,
               force_rgb: bool = False) -> np.ndarray:
    """uint8 [H, W, 3] for color PNGs, [H, W] for grayscale (PIL-equivalent
    channel semantics); force_rgb expands gray to RGB."""
    lib = _load()
    assert lib is not None
    buf = np.empty(max_dim * max_dim * 3, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.adsr_decode_png(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch),
        1 if force_rgb else 0)
    if rc != 0:
        raise IOError(f"adsr_decode_png({path}) failed: {rc}")
    n = h.value * w.value * ch.value
    out = buf[:n].reshape(h.value, w.value, ch.value).copy()
    return out[..., 0] if ch.value == 1 else out


def resize_lanczos(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    ch = img.shape[2]
    dst = np.empty((out_h, out_w, ch), np.uint8)
    rc = lib.adsr_resize_lanczos(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], ch,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    if rc != 0:
        raise ValueError(f"adsr_resize_lanczos failed: {rc}")
    return dst


def load_batch(paths: List[str], out_h: int, out_w: int,
               threads: int = 0) -> np.ndarray:
    """Threaded decode+resize of many PNGs -> uint8 [N, out_h, out_w, 3]."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    nt = threads or min(16, os.cpu_count() or 4)
    rc = lib.adsr_load_batch(
        blob, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nt)
    if rc != 0:
        raise IOError(f"adsr_load_batch failed: {rc}")
    return out
