"""ArrayRecord-backed trajectory dataset for pod-scale streaming.

The HDF5 datasets (:mod:`bubbleformer_tpu.data.dataset`) and their ``.npy``
memmap caches assume a local (or POSIX-mounted) filesystem with cheap random
access.  Multi-host pods streaming from blob storage want a record format
with per-record random access, parallel-friendly sharded reads, and
precomputed statistics — that is exactly what `ArrayRecord
<https://github.com/google/array_record>`_ provides (it is also grain's
native source format, so a converted dataset plugs into
:mod:`bubbleformer_tpu.data.grain_pipeline` unchanged).

Layout produced by ``scripts/convert_to_arrayrecord.py`` per trajectory:

* ``<name>.arrayrecord`` — one record per timestep: the ``(num_fields, H,
  W)`` float32 (or float16) frame, raw ``tobytes()`` in the sidecar's field
  order.
* ``<name>.arrayrecord.json`` — sidecar: field order, frame shape/dtype,
  trajectory length, per-field streaming stats (count/mean/std/min/max, the
  same one-pass moments as ``_streaming_field_stats``) and the fluid-params
  dict when the source had one.  ``normalize()`` therefore needs **no data
  scan at startup** — the reference re-scans every trajectory in every
  process (``bubbleformer/data/dataset.py:90-104``); here the constants are
  aggregated from the sidecars with the same per-file-averaged math.

:class:`ArrayRecordForecast` exposes the same surface as
:class:`~bubbleformer_tpu.data.dataset.BubbleForecast` (``__len__`` /
``normalize`` / ``_locate`` / ``__getitem__`` / ``get_batch`` /
``fluid_params_vector``), so the thread-prefetch DataLoader, the grain
adapter, and the Trainer all work on top of it unchanged.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from bubbleformer_tpu.data.dataset import DEFAULT_FIELDS, FLUID_PARAM_KEYS

try:  # array_record is optional (baked into this environment via grain).
    from array_record.python.array_record_module import ArrayRecordReader

    ARRAYRECORD_AVAILABLE = True
except ImportError:  # pragma: no cover
    ARRAYRECORD_AVAILABLE = False

SIDECAR_SUFFIX = ".json"


def sidecar_path(record_path: str) -> str:
    return record_path + SIDECAR_SUFFIX


class ArrayRecordForecast:
    """Sliding-window forecast dataset over ArrayRecord trajectory shards.

    Same sample semantics as ``BubbleForecast``: sample ``idx`` maps to a
    file and local start via the cumulative ``samples_per_file`` offsets,
    the input window covers ``[start, start+tw)`` and the target
    ``[start+tw, start+2tw)``, each returned as ``(T, C, H, W)`` float32
    (reference ``bubbleformer/data/dataset.py:68-72,120-131``).
    """

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
        if not ARRAYRECORD_AVAILABLE:  # pragma: no cover
            raise ImportError(
                "array_record is not installed; use BubbleForecast (HDF5) or "
                "install array_record for the streaming path"
            )
        self.filenames = list(filenames)
        self.input_fields = list(input_fields) if input_fields else list(DEFAULT_FIELDS)
        self.output_fields = list(output_fields) if output_fields else list(DEFAULT_FIELDS)
        self.norm = norm
        self.downsample_factor = downsample_factor
        self.time_window = time_window
        self.start_time = start_time
        self.return_fluid_params = return_fluid_params

        self.meta: List[dict] = []
        for path in self.filenames:
            with open(sidecar_path(path), "r", encoding="utf-8") as f:
                self.meta.append(json.load(f))
        self.traj_lens = [m["traj_len"] for m in self.meta]

        self.fields = list(dict.fromkeys(self.input_fields + self.output_fields))
        for m in self.meta:
            missing = [f for f in self.fields if f not in m["fields"]]
            if missing:
                raise ValueError(
                    f"record {m.get('source', '?')} lacks fields {missing} "
                    f"(has {m['fields']})"
                )
        self.diff_terms: Dict[str, float] = {k: 0.0 for k in self.fields}
        self.div_terms: Dict[str, float] = {k: 1.0 for k in self.fields}

        self._readers: List[Optional[ArrayRecordReader]] = [None] * len(self.filenames)

        if self.return_fluid_params:
            self.fluid_params = []
            for m in self.meta:
                if "fluid_params" not in m:
                    raise ValueError(
                        "return_fluid_params=True but sidecar has no fluid_params "
                        "(source trajectory had no .json parameter file)"
                    )
                self.fluid_params.append(m["fluid_params"])

    # -- indexing (identical math to BubbleForecast) -------------------------
    def samples_per_file(self) -> List[int]:
        return [
            length - self.start_time - 2 * self.time_window + 1
            for length in self.traj_lens
        ]

    def __len__(self) -> int:
        return sum(self.samples_per_file())

    def _locate(self, idx: int) -> Tuple[int, int]:
        cumulative = np.cumsum(self.samples_per_file())
        file_idx = int(np.searchsorted(cumulative, idx, side="right"))
        offset = int(cumulative[file_idx - 1]) if file_idx > 0 else 0
        start = idx + self.start_time - offset
        return file_idx, start

    # -- normalization from sidecar stats ------------------------------------
    def normalize(
        self,
        diff_terms: Optional[Dict[str, float]] = None,
        div_terms: Optional[Dict[str, float]] = None,
    ) -> Tuple[Dict[str, float], Dict[str, float]]:
        """Aggregate per-field constants from the sidecars — no data scan.

        Same math as the HDF5 path (per-file stats averaged across files,
        ``+ 1e-8`` on the divisor)."""
        if diff_terms is None and div_terms is None:
            diff_terms = {}
            div_terms = {}
            for field in self.fields:
                diffs, divs = [], []
                for m in self.meta:
                    if self.norm == "none":
                        diffs.append(0.0)
                        divs.append(1.0)
                        continue
                    stats = m["stats"][field]
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

    # -- record access -------------------------------------------------------
    def _reader(self, file_idx: int) -> ArrayRecordReader:
        # Readers are opened lazily (cheap pickling into grain/loader worker
        # processes: only the path travels) and kept per instance.
        r = self._readers[file_idx]
        if r is None:
            r = ArrayRecordReader(self.filenames[file_idx])
            self._readers[file_idx] = r
        return r

    def _frames(self, file_idx: int, t0: int, t1: int) -> np.ndarray:
        """Decode records [t0, t1) -> (t1-t0, num_fields, H, W) float32."""
        m = self.meta[file_idx]
        shape = tuple(m["frame_shape"])
        dtype = np.dtype(m["frame_dtype"])
        recs = self._reader(file_idx).read(list(range(t0, t1)))
        out = np.stack(
            [np.frombuffer(r, dtype=dtype).reshape(shape) for r in recs]
        ).astype(np.float32)
        return out

    def _window(self, file_idx: int, fields: List[str], t0: int, t1: int) -> np.ndarray:
        """(T, C, H, W) normalized window for the given field subset."""
        m = self.meta[file_idx]
        frames = self._frames(file_idx, t0, t1)
        f = self.downsample_factor
        if f > 1:
            frames = frames[:, :, ::f, ::f]
        idxs = [m["fields"].index(name) for name in fields]
        diff = np.asarray([self.diff_terms[name] for name in fields], np.float32)
        div = np.asarray([self.div_terms[name] for name in fields], np.float32)
        sel = frames[:, idxs]
        return (sel - diff[None, :, None, None]) / div[None, :, None, None]

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
        inp = self._window(file_idx, self.input_fields, start, start + tw)
        out = self._window(file_idx, self.output_fields, start + tw, start + 2 * tw)
        if self.return_fluid_params:
            return inp, out, self.fluid_params_vector(file_idx)
        return inp, out

    def get_batch(self, indices):
        """Assemble a full (inp, tgt[, params]) batch for the given indices."""
        samples = [self[int(i)] for i in np.asarray(indices, dtype=np.int64)]
        return tuple(
            np.stack([s[j] for s in samples]) for j in range(len(samples[0]))
        )

    def close(self) -> None:
        for r in self._readers:
            if r is not None:
                r.close()
        self._readers = [None] * len(self.filenames)
