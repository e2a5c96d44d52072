"""Native (C++) host components, loaded via ctypes.

Builds las_codec.cpp with g++ on first use (cached as las_codec.so next
to the source) and exposes a fast xyz decode for the streaming path;
everything degrades gracefully to the pure-Python io/las.py reader when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "las_codec.cpp")
_SO = os.path.join(_DIR, "las_codec.so")
_LAZ_SRC = os.path.join(_DIR, "laz_codec.cpp")
_LAZ_SO = os.path.join(_DIR, "laz_codec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_laz_lib: Optional[ctypes.CDLL] = None
_laz_tried = False


def _build(src: str = _SRC, so: str = _SO) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if
    unavailable (callers must fall back to the Python path)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.las_probe.restype = ctypes.c_longlong
        lib.las_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.las_read_xyz.restype = ctypes.c_longlong
        lib.las_read_xyz.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
        ]
        lib.las_read_xyz_range.restype = ctypes.c_longlong
        lib.las_read_xyz_range.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
            ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def get_laz_lib() -> Optional[ctypes.CDLL]:
    """The LAZ point codec (native/laz_codec.cpp), built on first use;
    None when no compiler is available."""
    global _laz_lib, _laz_tried
    with _lock:
        if _laz_lib is not None or _laz_tried:
            return _laz_lib
        _laz_tried = True
        if not os.path.exists(_LAZ_SO) or os.path.getmtime(_LAZ_SO) < os.path.getmtime(
            _LAZ_SRC
        ):
            if not _build(_LAZ_SRC, _LAZ_SO):
                return None
        try:
            lib = ctypes.CDLL(_LAZ_SO)
        except OSError:
            return None
        lib.laz_decode_points.restype = ctypes.c_longlong
        lib.laz_decode_points.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_uint,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.laz_encode_points.restype = ctypes.c_longlong
        lib.laz_encode_points.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_uint,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        # LAS 1.4 layered twins (formats 6-10, compressor 3)
        lib.laz_decode_points14.restype = ctypes.c_longlong
        lib.laz_decode_points14.argtypes = lib.laz_decode_points.argtypes
        lib.laz_encode_points14.restype = ctypes.c_longlong
        lib.laz_encode_points14.argtypes = lib.laz_encode_points.argtypes
        _laz_lib = lib
        return _laz_lib


def las_probe(path: str):
    """(count, scales f64[3], offsets f64[3], point_format) or None."""
    lib = get_lib()
    if lib is None:
        return None
    scales = (ctypes.c_double * 3)()
    offsets = (ctypes.c_double * 3)()
    fmt = ctypes.c_int()
    n = lib.las_probe(path.encode(), scales, offsets, ctypes.byref(fmt))
    if n < 0:
        return None
    return int(n), np.array(scales), np.array(offsets), fmt.value


def las_read_xyz(path: str) -> Optional[np.ndarray]:
    """Fast native decode of world xyz f64[N,3]; None -> use Python path."""
    probe = las_probe(path)
    if probe is None:
        return None
    n = probe[0]
    out = np.empty((max(n, 1), 3), np.float64)
    lib = get_lib()
    got = lib.las_read_xyz(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
    )
    if got < 0:
        return None
    return out[:got]


def las_read_xyz_range(path: str, start: int, count: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((max(count, 1), 3), np.float64)
    got = lib.las_read_xyz_range(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        start,
        count,
    )
    if got < 0:
        return None
    return out[:got]
