"""ctypes bindings for the native C++ runtime (native/).

Components (built from native/src by ``make -C native``):
- batched greedy + Hungarian assignment solvers (assignment.cpp);
- libjpeg/libpng decode + ADM center-crop + normalize in one GIL-releasing
  call (decode.cpp) — the native host-side data path for eval.

Loading is lazy and fault-tolerant: if the shared library is missing we try
one ``make`` then fall back to the pure-Python implementations; everything
keeps working, just slower. ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libjpdvt_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.jn_greedy_batch.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.jn_hungarian_batch.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.jn_decode_center_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, f32p]
        lib.jn_decode_center_crop.restype = ctypes.c_int
        lib.jn_probe.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.jn_probe.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def greedy_permutation(dist: np.ndarray) -> np.ndarray:
    """(B, P, P) or (P, P) float -> pred (B, P)/(P,) int32. Native with
    jnp fallback."""
    d = np.ascontiguousarray(np.asarray(dist, dtype=np.float32))
    squeeze = d.ndim == 2
    if squeeze:
        d = d[None]
    lib = _load()
    if lib is None:
        from . import assignment
        import jax.numpy as jnp

        out = np.asarray(assignment.greedy_permutation(jnp.asarray(d)))
        return out[0] if squeeze else out
    b, n, _ = d.shape
    out = np.empty((b, n), dtype=np.int32)
    lib.jn_greedy_batch(d, b, n, out)
    return out[0] if squeeze else out


def hungarian_permutation(dist: np.ndarray) -> np.ndarray:
    """(B, P, P) or (P, P) -> optimal pred. Native with scipy fallback."""
    d = np.ascontiguousarray(np.asarray(dist, dtype=np.float32))
    squeeze = d.ndim == 2
    if squeeze:
        d = d[None]
    lib = _load()
    if lib is None:
        from . import assignment

        out = assignment.hungarian_permutation(d)
        return out[0] if squeeze else out
    b, n, _ = d.shape
    out = np.empty((b, n), dtype=np.int32)
    lib.jn_hungarian_batch(d, b, n, out)
    return out[0] if squeeze else out


def _pil_decode_center_crop(data: bytes, image_size: int) -> np.ndarray:
    import io

    from PIL import Image

    from ..data import transforms as T

    img = T.center_crop_arr(Image.open(io.BytesIO(data)).convert("RGB"),
                            image_size)
    return T.normalize(T.to_array(img))


def decode_center_crop(data: bytes, image_size: int) -> np.ndarray:
    """JPEG/PNG bytes -> (S, S, 3) float32 in [-1, 1] via the native ADM
    pipeline. Formats the native decoder rejects (CMYK/YCCK JPEGs, exotic
    containers) transparently fall back to PIL; raises only when both fail.
    """
    lib = _load()
    if lib is None:
        return _pil_decode_center_crop(data, image_size)
    out = np.empty((image_size, image_size, 3), dtype=np.float32)
    rc = lib.jn_decode_center_crop(data, len(data), image_size, out)
    if rc != 0:
        try:
            return _pil_decode_center_crop(data, image_size)
        except Exception as e:
            raise ValueError(
                f"decode failed (native code {rc}; PIL: {e})") from e
    return out


def probe(data: bytes) -> tuple[int, int]:
    """-> (width, height) of an encoded image."""
    lib = _load()
    if lib is None:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:
            return im.size
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.jn_probe(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("native probe failed")
    return w.value, h.value
