"""ctypes bridge to the native C++ loader codecs (native/gguf_native.cpp).

The native library is the data-loader analog of the reference's C++ repack
path (ggml/src/ggml-cpu/repack.cpp): multithreaded block-format plane
extraction + TPU-layout transposes. Auto-builds with g++ on first import and
falls back silently to the pure-numpy implementations when unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "gguf_native.cpp")
_SO = os.path.join(_REPO, "native", "libggufnat.so")

_LIB = None
_TRIED = False
N_THREADS = min(os.cpu_count() or 4, 16)


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        r = subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-pthread", "-shared",
             "-o", _SO, _SRC],
            capture_output=True, timeout=120,
        )
        if r.returncode != 0:
            log.warning("native build failed: %s", r.stderr.decode()[:500])
            return False
        return True
    except Exception as e:  # pragma: no cover
        log.warning("native build unavailable: %s", e)
        return False


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LLAMA_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SRC) or not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.gnat_extract_planes.restype = ctypes.c_int
        lib.gnat_extract_planes.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.gnat_supported.restype = ctypes.c_int
        lib.gnat_has_mins.restype = ctypes.c_int
        lib.gnat_f16_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.gnat_transpose_i8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int]
        lib.gnat_transpose_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int]
        _LIB = lib
    except OSError as e:  # pragma: no cover
        log.warning("native lib load failed: %s", e)
    return _LIB


def native_supported(ggml_type: int) -> bool:
    lib = get_lib()
    return bool(lib and lib.gnat_supported(int(ggml_type)))


def extract_planes_native(raw: np.ndarray, ggml_type: int, n: int):
    """-> (q int8 [n], scales [n//g], mins|None, g) or None if unsupported."""
    lib = get_lib()
    if lib is None or not lib.gnat_supported(int(ggml_type)):
        return None
    raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
    q = np.empty(n, np.int8)
    has_mins = bool(lib.gnat_has_mins(int(ggml_type)))
    # group returned by the call; allocate worst case n//16 then slice
    sc = np.empty(n // 16, np.float32)
    mn = np.empty(n // 16, np.float32) if has_mins else None
    g = lib.gnat_extract_planes(
        int(ggml_type),
        raw.ctypes.data_as(ctypes.c_void_p), n,
        q.ctypes.data_as(ctypes.c_void_p),
        sc.ctypes.data_as(ctypes.c_void_p),
        mn.ctypes.data_as(ctypes.c_void_p) if mn is not None else None,
        N_THREADS,
    )
    if g <= 0:
        return None
    return q, sc[: n // g], None if mn is None else mn[: n // g], g


def transpose2d(a: np.ndarray) -> np.ndarray | None:
    """Threaded [r, c] -> [c, r] for int8/float32; None if unsupported."""
    lib = get_lib()
    if lib is None or a.ndim != 2:
        return None
    a = np.ascontiguousarray(a)
    out = np.empty((a.shape[1], a.shape[0]), a.dtype)
    if a.dtype == np.int8:
        lib.gnat_transpose_i8(a.ctypes.data_as(ctypes.c_void_p),
                              out.ctypes.data_as(ctypes.c_void_p),
                              a.shape[0], a.shape[1], N_THREADS)
    elif a.dtype == np.float32:
        lib.gnat_transpose_f32(a.ctypes.data_as(ctypes.c_void_p),
                               out.ctypes.data_as(ctypes.c_void_p),
                               a.shape[0], a.shape[1], N_THREADS)
    else:
        return None
    return out
