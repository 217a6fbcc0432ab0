"""Native (C++) runtime components, loaded via ctypes.

The compute path of this framework is JAX/XLA/Pallas on TPU; the native
tier here covers host-side runtime work the reference also kept native-
adjacent (text chain IO at production scale).  Built on first use with
g++ (no pybind11 in this environment); everything degrades gracefully to
the numpy implementations if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["chain_write", "chain_read_rows", "native_available"]

_DIR = Path(__file__).parent
_SRC = _DIR / "chainio.cpp"
_SO = _DIR / "_chainio.so"
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not _SO.exists()
                    or _SO.stat().st_mtime < _SRC.stat().st_mtime):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", str(_SRC),
                     "-o", str(_SO)],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_SO))
            lib.chainio_write.restype = ctypes.c_int
            lib.chainio_write.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.c_long]
            lib.chainio_count_rows.restype = ctypes.c_long
            lib.chainio_count_rows.argtypes = [ctypes.c_char_p]
            lib.chainio_read.restype = ctypes.c_long
            lib.chainio_read.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.c_long]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def chain_write(path, rows: np.ndarray) -> bool:
    """Append (n_rows, n_cols) float64 rows (col 0 = walker index).
    Returns False if the native library is unavailable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return False
    rows = np.ascontiguousarray(rows, np.float64)
    rc = lib.chainio_write(
        str(path).encode(), rows.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        rows.shape[0], rows.shape[1])
    if rc != 0:
        raise OSError(f"native chain write failed for {path}")
    return True


def chain_read_rows(path, n_cols: int):
    """Read all data rows of a chain file -> (n_rows, n_cols) array, or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n_rows = lib.chainio_count_rows(str(path).encode())
    if n_rows < 0:
        raise OSError(f"cannot read {path}")
    out = np.empty((n_rows, n_cols), np.float64)
    got = lib.chainio_read(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_rows, n_cols)
    if got < 0:
        raise OSError(f"native chain read failed for {path}")
    return out[:got]
