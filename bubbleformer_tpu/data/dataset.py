"""Sliding-window HDF5 dataset for BubbleML trajectories.

Counterpart of reference ``bubbleformer/data/dataset.py:16-186`` with the
same public surface (constructor args, ``__len__``, ``normalize``,
``__getitem__`` semantics and the ``(T, C, H, W)`` float32 sample layout)
and two deliberate TPU-side improvements:

* ``normalize()`` computes the per-field global constants with a *streaming*
  chunked scan instead of materializing every field of every file in memory
  (the reference reads ``h5_file[field][...]`` wholesale at
  ``dataset.py:90-104`` — a full-dataset scan per process at startup).
* samples are returned as numpy arrays (host-side); batching/prefetch and
  device transfer live in :mod:`bubbleformer_tpu.data.pipeline`.

Sliding-window indexing is kept bit-for-bit: samples per file =
``traj_len - start_time - 2*time_window + 1`` (reference ``dataset.py:68-72``),
input window ``[start, start+tw)``, target ``[start+tw, start+2tw)`` where
``start = idx + start_time - cumulative_offset`` (``dataset.py:120-131``).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import h5py as h5
import numpy as np

DEFAULT_FIELDS = ["dfun", "temperature", "velx", "vely"]

# Fluid-parameter vector layout (reference ``dataset.py:168-180``).
FLUID_PARAM_KEYS = [
    "inv_reynolds",
    "cpgas",
    "mugas",
    "rhogas",
    "thcogas",
    "stefan",
    "prandtl",
    ("heater", "nucWaitTime"),
    ("heater", "wallTemp"),
]


def _streaming_field_stats(dset: h5.Dataset, chunk: int = 64) -> Dict[str, float]:
    """One-pass count/sum/sumsq/min/max over a (T, H, W) HDF5 dataset."""
    n = 0
    total = 0.0
    total_sq = 0.0
    vmin = np.inf
    vmax = -np.inf
    for t0 in range(0, dset.shape[0], chunk):
        block = np.asarray(dset[t0 : t0 + chunk], dtype=np.float64)
        n += block.size
        total += float(block.sum())
        total_sq += float((block * block).sum())
        vmin = min(vmin, float(block.min()))
        vmax = max(vmax, float(block.max()))
    mean = total / n
    var = max(total_sq / n - mean * mean, 0.0)
    return {"mean": mean, "std": float(np.sqrt(var)), "min": vmin, "max": vmax}


class BubbleForecast:
    """Map-style dataset over N flat-grid HDF5 trajectory files."""

    def __init__(
        self,
        filenames: Sequence[str],
        input_fields: Optional[List[str]] = None,
        output_fields: Optional[List[str]] = None,
        norm: str = "none",
        downsample_factor: int = 1,
        time_window: int = 16,
        start_time: int = 50,
        return_fluid_params: bool = False,
    ):
        self.filenames = list(filenames)
        self.input_fields = list(input_fields) if input_fields else list(DEFAULT_FIELDS)
        self.output_fields = list(output_fields) if output_fields else list(DEFAULT_FIELDS)
        self.norm = norm
        self.downsample_factor = downsample_factor
        self.time_window = time_window
        self.start_time = start_time
        self.return_fluid_params = return_fluid_params

        self.data = [h5.File(fname, "r") for fname in self.filenames]
        self.traj_lens = [f[self.input_fields[0]].shape[0] for f in self.data]

        self.fields = list(dict.fromkeys(self.input_fields + self.output_fields))
        self.diff_terms: Dict[str, float] = {k: 0.0 for k in self.fields}
        self.div_terms: Dict[str, float] = {k: 1.0 for k in self.fields}

        if self.return_fluid_params:
            self.fluid_params = []
            for fname in self.filenames:
                with open(fname.replace(".hdf5", ".json"), "r", encoding="utf-8") as f:
                    self.fluid_params.append(json.load(f))

    # -- indexing -----------------------------------------------------------
    def samples_per_file(self) -> List[int]:
        return [
            length - self.start_time - 2 * self.time_window + 1
            for length in self.traj_lens
        ]

    def __len__(self) -> int:
        return sum(self.samples_per_file())

    # -- normalization ------------------------------------------------------
    def normalize(
        self,
        diff_terms: Optional[Dict[str, float]] = None,
        div_terms: Optional[Dict[str, float]] = None,
    ) -> Tuple[Dict[str, float], Dict[str, float]]:
        """Compute (or adopt) per-field normalization constants.

        Matches the reference exactly for each ``norm`` mode — including the
        per-file-then-averaged aggregation and the ``+ 1e-8`` on the divisor
        (``dataset.py:111-112``) — but streams each file instead of loading
        it whole.
        """
        if diff_terms is None and div_terms is None:
            diff_terms = {}
            div_terms = {}
            for field in self.fields:
                diffs, divs = [], []
                for h5_file in self.data:
                    if self.norm == "none":
                        diffs.append(0.0)
                        divs.append(1.0)
                        continue
                    stats = _streaming_field_stats(h5_file[field])
                    if self.norm == "std":
                        diffs.append(stats["mean"])
                        divs.append(stats["std"])
                    elif self.norm == "minmax":
                        diffs.append(stats["min"])
                        divs.append(stats["max"] - stats["min"])
                    elif self.norm == "tanh":
                        diffs.append((stats["max"] + stats["min"]) / 2.0)
                        divs.append((stats["max"] - stats["min"]) / 2.0)
                    else:
                        raise ValueError(f"Unknown normalization type: {self.norm}")
                diff_terms[field] = float(np.mean(diffs))
                div_terms[field] = float(np.mean(divs)) + 1e-8

        self.diff_terms = diff_terms
        self.div_terms = div_terms
        return self.diff_terms, self.div_terms

    # -- sample access ------------------------------------------------------
    def _locate(self, idx: int) -> Tuple[int, int]:
        cumulative = np.cumsum(self.samples_per_file())
        file_idx = int(np.searchsorted(cumulative, idx, side="right"))
        offset = int(cumulative[file_idx - 1]) if file_idx > 0 else 0
        start = idx + self.start_time - offset
        return file_idx, start

    def _read_window(self, file_idx: int, field: str, t0: int, t1: int) -> np.ndarray:
        data = np.asarray(self.data[file_idx][field][t0:t1], dtype=np.float32)
        f = self.downsample_factor
        if f > 1:
            # Nearest-neighbor to (H//f, W//f); for divisible extents this is
            # exactly torch's F.interpolate(mode="nearest") index map i -> i*f.
            data = data[:, ::f, ::f]
        return (data - self.diff_terms[field]) / self.div_terms[field]

    def fluid_params_vector(self, file_idx: int) -> np.ndarray:
        params = self.fluid_params[file_idx]
        values = []
        for key in FLUID_PARAM_KEYS:
            if isinstance(key, tuple):
                values.append(params[key[0]][key[1]])
            else:
                values.append(params[key])
        return np.asarray(values, dtype=np.float32)

    def __getitem__(self, idx: int):
        file_idx, start = self._locate(idx)
        tw = self.time_window

        inp = np.stack(
            [self._read_window(file_idx, f, start, start + tw) for f in self.input_fields]
        )  # (C_in, T, H, W)
        out = np.stack(
            [
                self._read_window(file_idx, f, start + tw, start + 2 * tw)
                for f in self.output_fields
            ]
        )  # (C_out, T, H, W)

        inp = np.transpose(inp, (1, 0, 2, 3))  # (T, C, H, W)
        out = np.transpose(out, (1, 0, 2, 3))

        if self.return_fluid_params:
            return inp, out, self.fluid_params_vector(file_idx)
        return inp, out

    # -- native fast path -----------------------------------------------------
    def enable_native(self, cache_dir: Optional[str] = None) -> bool:
        """Switch batch assembly to the C/OpenMP fast path.

        Builds per-field ``.npy`` memory-mapped caches (one-time) and routes
        ``get_batch`` through the native assembler.  Returns False (and stays
        on the numpy path) when no C compiler is available.
        """
        from bubbleformer_tpu.data import native as native_mod

        if not native_mod.available():
            return False
        from bubbleformer_tpu.data.cache import open_field_caches

        self._native_caches = open_field_caches(self.filenames, self.fields, cache_dir)
        self._native = True
        return True

    def get_batch(self, indices):
        """Assemble a full (inp, tgt[, params]) batch for the given indices."""
        indices = np.asarray(indices, dtype=np.int64)
        if not getattr(self, "_native", False):
            samples = [self[int(i)] for i in indices]
            return tuple(
                np.stack([s[j] for s in samples]) for j in range(len(samples[0]))
            )

        from bubbleformer_tpu.data import native as native_mod

        tw = self.time_window
        located = [self._locate(int(i)) for i in indices]
        batch = len(indices)
        f = self.downsample_factor
        h, w = self.data[0][self.input_fields[0]].shape[1:]
        inp = np.empty(
            (batch, tw, len(self.input_fields), h // f, w // f), np.float32
        )
        out = np.empty(
            (batch, tw, len(self.output_fields), h // f, w // f), np.float32
        )

        def fields_arrays(file_idx, names):
            return [self._native_caches[file_idx][name] for name in names]

        # Group rows by source file so each native call gathers contiguously
        # from one set of memmaps.
        by_file: Dict[int, List[int]] = {}
        for row, (file_idx, _) in enumerate(located):
            by_file.setdefault(file_idx, []).append(row)
        for file_idx, rows in by_file.items():
            starts = np.asarray([located[r][1] for r in rows], dtype=np.int64)
            diff_in = np.asarray([self.diff_terms[k] for k in self.input_fields])
            div_in = np.asarray([self.div_terms[k] for k in self.input_fields])
            inp[rows] = native_mod.assemble_windows(
                fields_arrays(file_idx, self.input_fields), starts, tw, f, diff_in, div_in
            )
            diff_out = np.asarray([self.diff_terms[k] for k in self.output_fields])
            div_out = np.asarray([self.div_terms[k] for k in self.output_fields])
            out[rows] = native_mod.assemble_windows(
                fields_arrays(file_idx, self.output_fields),
                starts + tw,
                tw,
                f,
                diff_out,
                div_out,
            )

        if self.return_fluid_params:
            params = np.stack(
                [self.fluid_params_vector(fi) for fi, _ in located]
            ).astype(np.float32)
            return inp, out, params
        return inp, out

    def close(self) -> None:
        for f in self.data:
            f.close()
