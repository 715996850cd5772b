"""ctypes bindings for the native C++ snapshot writer (native/fdtd_io.cpp).

The library is built on first use if a toolchain is present (``make -C
native``); everything falls back transparently to the pure-Python writer in
:mod:`fdtd_tpu.io.vtr` when the shared object is unavailable.  ctypes FFI
calls release the GIL, so native encodes/writes overlap the step loop when
invoked from the snapshot worker threads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfdtd_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            capture_output=True,
            timeout=120,
        )
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fdtd_write_vtr.restype = ctypes.c_int
        lib.fdtd_write_vtr.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fdtd_write_raw.restype = ctypes.c_int
        lib.fdtd_write_raw.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def write_vtr_native(path: str, coords, cell_arrays: dict[str, np.ndarray]) -> bool:
    """Write via the C++ library; returns False if unavailable (caller
    should fall back to the Python writer)."""
    lib = get_lib()
    if lib is None:
        return False
    x, y, z = (np.ascontiguousarray(c, dtype=np.float64) for c in coords)
    names = []
    datas = []
    dtypes = []
    keep = []  # keep ndarray refs alive across the call
    for name, arr in cell_arrays.items():
        a = np.ascontiguousarray(arr)
        if a.dtype == np.float32:
            dt = 0
        elif a.dtype == np.float64:
            dt = 1
        else:
            a = a.astype(np.float32)
            dt = 0
        expected = (len(z) - 1, len(y) - 1, len(x) - 1)
        if a.shape != expected:
            raise ValueError(f"{name}: shape {a.shape} != {expected}")
        keep.append(a)
        names.append(name.encode())
        datas.append(a.ctypes.data_as(ctypes.c_void_p))
        dtypes.append(dt)

    n = len(names)
    rc = lib.fdtd_write_vtr(
        path.encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(y),
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(z),
        n,
        (ctypes.c_char_p * n)(*names),
        (ctypes.c_void_p * n)(*datas),
        (ctypes.c_int * n)(*dtypes),
    )
    if rc != 0:
        raise OSError(f"fdtd_write_vtr failed with code {rc} for {path}")
    return True


def write_raw_native(path: str, arrays: dict[str, np.ndarray]) -> bool:
    """Write the FDTDRAW1 container via the C++ library (fast checkpoint
    path); returns False if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    names, datas, dtypes, nelems, keep = [], [], [], [], []
    for name, arr in arrays.items():
        a = np.ascontiguousarray(arr)
        if a.dtype == np.float32:
            dt = 0
        elif a.dtype == np.float64:
            dt = 1
        else:
            raise ValueError(f"{name}: unsupported dtype {a.dtype}")
        keep.append(a)
        names.append(name.encode())
        datas.append(a.ctypes.data_as(ctypes.c_void_p))
        dtypes.append(dt)
        nelems.append(a.size)
    n = len(names)
    rc = lib.fdtd_write_raw(
        path.encode(), n,
        (ctypes.c_char_p * n)(*names),
        (ctypes.c_void_p * n)(*datas),
        (ctypes.c_int * n)(*dtypes),
        (ctypes.c_int64 * n)(*nelems),
    )
    if rc != 0:
        raise OSError(f"fdtd_write_raw failed with code {rc} for {path}")
    return True


def read_raw(path: str) -> dict[str, np.ndarray]:
    """Read an FDTDRAW1 container (flat arrays; caller reshapes)."""
    import struct

    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != b"FDTDRAW1":
            raise ValueError(f"{path}: not an FDTDRAW1 file")
        (n,) = struct.unpack("<i", f.read(4))
        out = {}
        for _ in range(n):
            (name_len,) = struct.unpack("<i", f.read(4))
            name = f.read(name_len).decode()
            dt, = struct.unpack("<i", f.read(4))
            ne, = struct.unpack("<q", f.read(8))
            dtype = np.float32 if dt == 0 else np.float64
            out[name] = np.fromfile(f, dtype=dtype, count=ne)
        return out
