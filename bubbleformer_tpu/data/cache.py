"""Memory-mapped field caches for the native input pipeline.

HDF5 chunked storage is convenient for archival but every window read goes
through the HDF5 chunk cache and type pipeline.  For training-time access,
each (file, field) trajectory is converted once to a flat ``.npy`` alongside
the source (or under ``cache_dir``) and memory-mapped; the OS page cache
then serves the sliding windows, and the native assembler
(:mod:`bubbleformer_tpu.data.native`) gathers/normalizes batches straight
out of the mapping with OpenMP.
"""
from __future__ import annotations

import os
import tempfile
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np


def cache_path(h5_path: str, field: str, cache_dir: Optional[str] = None) -> str:
    base = os.path.basename(h5_path).replace(".hdf5", "").replace(".h5", "")
    directory = cache_dir if cache_dir else os.path.dirname(os.path.abspath(h5_path))
    return os.path.join(directory, f"{base}.{field}.npy")


def ensure_field_cache(
    h5_path: str, field: str, cache_dir: Optional[str] = None, chunk: int = 64
) -> str:
    """Convert one HDF5 field to a flat .npy (streaming); returns the path."""
    path = cache_path(h5_path, field, cache_dir)
    if os.path.exists(path):
        return path
    # Unique temp name per writer: concurrent builders (multiple hosts on a
    # shared filesystem, or train+eval jobs) must not share a tmp file, or
    # one could os.replace a partially written cache into place.  Whoever
    # renames first wins; the final path, once present, is authoritative.
    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".", suffix=".tmp", dir=os.path.dirname(path)
    )
    os.close(fd)
    try:
        with h5py.File(h5_path, "r") as f:
            dset = f[field]
            shape = dset.shape
            out = np.lib.format.open_memmap(
                tmp, mode="w+", dtype=np.float32, shape=shape
            )
            for t0 in range(0, shape[0], chunk):
                out[t0 : t0 + chunk] = dset[t0 : t0 + chunk]
            out.flush()
            del out
        if os.path.exists(path):
            os.unlink(tmp)  # another writer finished first
        else:
            os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def open_field_caches(
    filenames: Sequence[str],
    fields: Sequence[str],
    cache_dir: Optional[str] = None,
) -> List[Dict[str, np.ndarray]]:
    """Per-file dict of memory-mapped (T, H, W) float32 field arrays."""
    caches = []
    for fname in filenames:
        per_file = {}
        for field in fields:
            path = ensure_field_cache(fname, field, cache_dir)
            per_file[field] = np.load(path, mmap_mode="r")
        caches.append(per_file)
    return caches
