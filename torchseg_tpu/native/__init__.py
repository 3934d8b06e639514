"""Native (C++/OpenMP) host-side augmentation kernels, JIT-built at first
import — mirroring how the reference JIT-compiles its extension at import
(furnace/legacy/sync_bn/src/__init__.py:8-18) — and bound via ctypes.

``lib()`` returns the loaded library or None when no compiler is available;
callers fall back to the cv2/numpy implementations in data/transforms.py.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "augment.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_augment.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        try:  # retry without -march=native (portability)
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=240)
            return True
        except Exception:
            return False


def lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i = ctypes.c_int
        l.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
        l.resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
        l.hflip_u8.argtypes = [u8p, i, i, i, u8p]
        l.crop_normalize_pad_f32.argtypes = [
            u8p, i, i, i, f32p, f32p, f32p, i, i, i, i, ctypes.c_float,
        ]
        l.crop_pad_i32.argtypes = [
            i32p, i, i, i32p, i, i, i, i, ctypes.c_int32,
        ]
        _lib = l
        return _lib


# ---------------------------------------------------------------------
# numpy-facing wrappers (None-safe callers should check available()).
# ---------------------------------------------------------------------
def available() -> bool:
    return lib() is not None


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((dh, dw) if img.ndim == 2 else (dh, dw, c), np.uint8)
    lib().resize_bilinear_u8(img.reshape(h, w, c), h, w, c,
                             out.reshape(dh, dw, c), dh, dw)
    return out


def resize_nearest(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((dh, dw) if img.ndim == 2 else (dh, dw, c), np.uint8)
    lib().resize_nearest_u8(img.reshape(h, w, c), h, w, c,
                            out.reshape(dh, dw, c), dh, dw)
    return out


def hflip(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty_like(img)
    lib().hflip_u8(img.reshape(h, w, c), h, w, c, out.reshape(h, w, c))
    return out


def crop_normalize_pad(
    img: np.ndarray, mean, std, ch: int, cw: int, y0: int, x0: int,
    pad_val: float = 0.0,
) -> np.ndarray:
    """uint8 HWC -> float32 (ch, cw, C) normalized crop with constant pad."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((ch, cw, c), np.float32)
    lib().crop_normalize_pad_f32(
        img, h, w, c,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        out, ch, cw, y0, x0, ctypes_float(pad_val),
    )
    return out


def crop_pad_labels(
    gt: np.ndarray, ch: int, cw: int, y0: int, x0: int, pad_val: int
) -> np.ndarray:
    gt = np.ascontiguousarray(gt, np.int32)
    h, w = gt.shape
    out = np.empty((ch, cw), np.int32)
    lib().crop_pad_i32(gt, h, w, out, ch, cw, y0, x0, int(pad_val))
    return out


def ctypes_float(v):
    return ctypes.c_float(float(v))
