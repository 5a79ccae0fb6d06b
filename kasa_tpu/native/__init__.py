"""ctypes bindings for the native loader (loader.cpp).

The shared library is built lazily with g++ on first use and cached
next to the source; every entry point degrades gracefully to None when
no compiler is available, so the pure-Python paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "_kasa_loader.so")
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-lz"]
    try:
        return subprocess.run(cmd, capture_output=True).returncode == 0
    except OSError:
        return False


def get_lib():
    """The loaded library, building it on first call; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.kasa_load_fastx.restype = ctypes.c_void_p
        lib.kasa_load_fastx.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.kasa_fill.restype = None
        lib.kasa_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
        lib.kasa_release.argtypes = [ctypes.c_void_p]
        lib.kasa_sanitize.restype = ctypes.c_int64
        lib.kasa_sanitize.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int]
        lib.kasa_umap_bytes.restype = ctypes.c_int64
        lib.kasa_umap_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def load_fastx(path: str, is_fastq: bool):
    """Parse a fasta/fastq(.gz) file natively.

    Returns (seq, seq_off, names, name_off, nlines) numpy arrays or
    None when the native library is unavailable or IO failed."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    sb = ctypes.c_int64()
    nb = ctypes.c_int64()
    handle = lib.kasa_load_fastx(path.encode(), int(path.endswith(".gz")),
                                 int(is_fastq), ctypes.byref(n),
                                 ctypes.byref(sb), ctypes.byref(nb))
    if not handle:
        return None
    try:
        seq = np.empty(sb.value, np.uint8)
        seq_off = np.empty(n.value + 1, np.int64)
        names = np.empty(nb.value, np.uint8)
        name_off = np.empty(n.value + 1, np.int64)
        nlines = np.empty(n.value, np.int32)
        lib.kasa_fill(handle,
                      seq.ctypes.data_as(ctypes.c_void_p),
                      seq_off.ctypes.data_as(ctypes.c_void_p),
                      names.ctypes.data_as(ctypes.c_void_p),
                      name_off.ctypes.data_as(ctypes.c_void_p),
                      nlines.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.kasa_release(handle)
    return seq, seq_off, names, name_off, nlines


def sanitize_inplace(seq: np.ndarray, protein: bool) -> int | None:
    """In-place native sanitize; returns whitespace count or None."""
    lib = get_lib()
    if lib is None or not seq.flags.c_contiguous:
        return None
    return int(lib.kasa_sanitize(seq.ctypes.data_as(ctypes.c_void_p),
                                 len(seq), int(protein)))
