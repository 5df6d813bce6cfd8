"""ctypes bindings for the native (C++/libpng) data loader.

Builds tpusr/native/loader.cc on first use (g++ -O3 -shared, cached next to
the source; no pybind11 in this environment — plain C ABI via ctypes). All
entry points release the GIL for the duration of the C call, so a plain
ThreadPoolExecutor parallelizes dataset prep across cores.

``available()`` gates use: if the toolchain or libpng is missing the callers
(tpusr/data/div2k.py) silently keep the PIL path — identical bytes either
way (tests/test_native_loader.py proves it against Pillow itself).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_SO = os.path.join(_DIR, "_loader.so")

_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # compile to a pid-unique temp then os.rename (atomic on one fs): two
    # concurrent processes sharing the checkout must never CDLL a partially
    # written .so
    tmp = f"{_SO}.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp,
           _SRC, "-lpng", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.rename(tmp, _SO)
        return _SO
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("TPUSR_NATIVE_LOADER", "auto") == "off":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tpusr_decode_png.restype = ctypes.c_int
    lib.tpusr_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tpusr_resize_bicubic_u8.restype = None
    lib.tpusr_resize_bicubic_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int]
    lib.tpusr_load_pair.restype = ctypes.c_int
    lib.tpusr_load_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tpusr_free.restype = None
    lib.tpusr_free.argtypes = [u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _take(lib, ptr, h, w) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    lib.tpusr_free(ptr)
    return arr


def decode_png(path: str) -> np.ndarray:
    """RGB8 (H, W, 3) like np.array(PIL.Image.open(path).convert('RGB'))."""
    lib = _load()
    assert lib is not None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    data = u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.tpusr_decode_png(path.encode(), ctypes.byref(data),
                              ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"tpusr_decode_png({path}) failed: rc={rc}")
    return _take(lib, data, h, w)


def resize_bicubic_u8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Byte-exact PIL BICUBIC resize of an (H, W, C) uint8 array."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    out = np.empty((out_h, out_w, ch), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tpusr_resize_bicubic_u8(
        img.ctypes.data_as(u8p), h, w, ch,
        out.ctypes.data_as(u8p), out_h, out_w)
    return out


def load_pair(hr_path: str, lr_path: str, scale_factor: int,
              downsample: bool) -> tuple[np.ndarray, np.ndarray]:
    """The reference get_image_pair resize chain (dataset.py:9-46), native.

    Returns (lr_u8, hr_u8) HWC arrays BEFORE noise/scaling — the keyed noise
    and [0,1]/[-1,1] mapping stay in tpusr/data/div2k.py (numpy semantics).
    """
    lib = _load()
    assert lib is not None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lrp, hrp = u8p(), u8p()
    lh, lw, hh, hw = (ctypes.c_int() for _ in range(4))
    rc = lib.tpusr_load_pair(
        hr_path.encode(), lr_path.encode(), scale_factor, int(downsample),
        ctypes.byref(lrp), ctypes.byref(lh), ctypes.byref(lw),
        ctypes.byref(hrp), ctypes.byref(hh), ctypes.byref(hw))
    if rc != 0:
        raise IOError(f"tpusr_load_pair({hr_path}) failed: rc={rc}")
    return _take(lib, lrp, lh, lw), _take(lib, hrp, hh, hw)
