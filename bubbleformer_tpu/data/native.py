"""ctypes bridge to the native (C + OpenMP) batch assembler.

Compiles ``bubbleformer_tpu/native/batch_assembler.c`` on first use into a
cached shared object and exposes:

* :func:`assemble_windows` — batched sliding-window gather + downsample +
  normalize into the (B, T, C, H', W') training layout;
* :func:`field_stats` — one-pass sum/sumsq/min/max for normalization
  constants.

Falls back silently (``AVAILABLE = False``) when no C compiler exists; the
numpy path in :mod:`bubbleformer_tpu.data.dataset` remains authoritative for
semantics (golden-tested against it).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "batch_assembler.c")
_LIB: Optional[ctypes.CDLL] = None
AVAILABLE = False


def _build_library() -> Optional[str]:
    cache_dir = os.path.join(tempfile.gettempdir(), "bubbleformer_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "batch_assembler.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    for cc in ("cc", "gcc", "clang"):
        cmd = [cc, "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", so_path]
        try:
            res = subprocess.run(cmd, capture_output=True, timeout=120)
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
        if res.returncode == 0:
            return so_path
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, AVAILABLE
    if _LIB is not None:
        return _LIB
    so_path = _build_library()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    lib.assemble_windows.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),  # field_ptrs
        ctypes.c_int64,  # num_fields
        ctypes.c_int64,  # traj_h
        ctypes.c_int64,  # traj_w
        ctypes.POINTER(ctypes.c_int64),  # starts
        ctypes.c_int64,  # batch
        ctypes.c_int64,  # tw
        ctypes.c_int64,  # factor
        ctypes.POINTER(ctypes.c_float),  # diff
        ctypes.POINTER(ctypes.c_float),  # div
        ctypes.POINTER(ctypes.c_float),  # out
    ]
    lib.field_stats.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    AVAILABLE = True
    return lib


def available() -> bool:
    return _load() is not None


def assemble_windows(
    fields: Sequence[np.ndarray],
    starts: np.ndarray,
    time_window: int,
    factor: int,
    diff: np.ndarray,
    div: np.ndarray,
) -> np.ndarray:
    """(B, T, C, H/factor, W/factor) batch from (T, H, W) field buffers."""
    lib = _load()
    assert lib is not None, "native assembler unavailable"
    num_fields = len(fields)
    t, h, w = fields[0].shape
    for f in fields:
        assert f.dtype == np.float32 and f.flags["C_CONTIGUOUS"]

    starts = np.ascontiguousarray(starts, dtype=np.int64)
    diff = np.ascontiguousarray(diff, dtype=np.float32)
    div = np.ascontiguousarray(div, dtype=np.float32)
    batch = starts.shape[0]
    out = np.empty((batch, time_window, num_fields, h // factor, w // factor), np.float32)

    ptr_array = (ctypes.c_void_p * num_fields)(
        *[f.ctypes.data_as(ctypes.c_void_p) for f in fields]
    )
    lib.assemble_windows(
        ptr_array,
        num_fields,
        h,
        w,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        time_window,
        factor,
        diff.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        div.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def field_stats(data: np.ndarray) -> dict:
    """One-pass mean/std/min/max of a float32 array (native, OpenMP)."""
    lib = _load()
    assert lib is not None, "native assembler unavailable"
    data = np.ascontiguousarray(data, dtype=np.float32)
    out = np.zeros(4, np.float64)
    lib.field_stats(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    n = data.size
    mean = out[0] / n
    var = max(out[1] / n - mean * mean, 0.0)
    return {"mean": mean, "std": float(np.sqrt(var)), "min": out[2], "max": out[3]}
