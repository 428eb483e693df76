"""Data pipeline tests: synthetic HDF5 fixtures, indexing/normalization golden
against the reference dataset (loaded standalone), loader sharding."""
import json
import os

import h5py
import numpy as np
import pytest

from tests._reference import load_reference_module, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

FIELDS = ["dfun", "temperature", "velx", "vely"]


@pytest.fixture(scope="module")
def sample_files(tmp_path_factory):
    """Two synthetic 50x32x32 trajectories with fluid-param sidecars."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        path = str(root / f"traj_{i}.hdf5")
        with h5py.File(path, "w") as f:
            for field in FIELDS:
                f.create_dataset(
                    field, data=rng.standard_normal((50, 32, 32)).astype(np.float32)
                )
        params = {
            "inv_reynolds": 0.01,
            "cpgas": 1.0,
            "mugas": 2.0,
            "rhogas": 3.0,
            "thcogas": 4.0,
            "stefan": 5.0,
            "prandtl": 6.0,
            "heater": {"nucWaitTime": 0.2, "wallTemp": 90.0},
        }
        with open(path.replace(".hdf5", ".json"), "w") as f:
            json.dump(params, f)
        paths.append(path)
    return paths


@pytest.mark.parametrize("norm", ["none", "std", "minmax", "tanh"])
@pytest.mark.parametrize("time_window", [2, 5])
def test_dataset_len_and_shapes(sample_files, norm, time_window):
    from bubbleformer_tpu.data import BubbleForecast

    ds = BubbleForecast(
        sample_files,
        input_fields=FIELDS,
        output_fields=FIELDS,
        norm=norm,
        time_window=time_window,
        start_time=5,
    )
    ds.normalize()
    expected = 2 * (50 - 5 - 2 * time_window + 1)
    assert len(ds) == expected
    inp, out = ds[0]
    assert inp.shape == (time_window, 4, 32, 32)
    assert out.shape == (time_window, 4, 32, 32)
    assert inp.dtype == np.float32


@requires_reference
@pytest.mark.parametrize("norm", ["none", "std", "minmax", "tanh"])
@pytest.mark.parametrize("downsample", [1, 2])
def test_dataset_golden_vs_reference(sample_files, norm, downsample):
    ref = load_reference_module("ref_dataset", "bubbleformer/data/dataset.py")
    from bubbleformer_tpu.data import BubbleForecast

    kwargs = dict(
        input_fields=FIELDS,
        output_fields=FIELDS[:3],
        norm=norm,
        downsample_factor=downsample,
        time_window=3,
        start_time=4,
    )
    ours = BubbleForecast(sample_files, **kwargs)
    ours.normalize()
    theirs = ref.BubbleForecast(sample_files, **kwargs)
    theirs.normalize()

    assert len(ours) == len(theirs)
    for field in FIELDS:
        np.testing.assert_allclose(
            ours.diff_terms[field], theirs.diff_terms[field], rtol=1e-5
        )
        np.testing.assert_allclose(
            ours.div_terms[field], theirs.div_terms[field], rtol=1e-5
        )
    for idx in [0, 7, len(ours) - 1]:
        inp_j, out_j = ours[idx]
        inp_t, out_t = theirs[idx]
        np.testing.assert_allclose(inp_j, inp_t.numpy(), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(out_j, out_t.numpy(), atol=1e-5, rtol=1e-4)


@requires_reference
def test_fluid_params_golden(sample_files):
    ref = load_reference_module("ref_dataset2", "bubbleformer/data/dataset.py")
    from bubbleformer_tpu.data import BubbleForecast

    kwargs = dict(
        input_fields=FIELDS, output_fields=FIELDS, norm="none",
        time_window=3, start_time=4, return_fluid_params=True,
    )
    ours = BubbleForecast(sample_files, **kwargs)
    ours.normalize()
    theirs = ref.BubbleForecast(sample_files, **kwargs)
    theirs.normalize()
    _, _, fp_j = ours[0]
    _, _, fp_t = theirs[0]
    np.testing.assert_allclose(fp_j, fp_t.numpy(), atol=1e-6)


def test_loader_batching_and_sharding(sample_files):
    from bubbleformer_tpu.data import BubbleForecast, DataLoader

    ds = BubbleForecast(
        sample_files, input_fields=FIELDS, output_fields=FIELDS, norm="none",
        time_window=2, start_time=5,
    )
    ds.normalize()

    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    inp, out = batches[0]
    assert inp.shape == (8, 2, 4, 32, 32)

    # Two-process sharding partitions the permutation disjointly.
    l0 = DataLoader(ds, batch_size=4, shuffle=True, seed=1, process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=4, shuffle=True, seed=1, process_index=1, process_count=2)
    i0 = set(l0._local_indices().tolist())
    i1 = set(l1._local_indices().tolist())
    assert i0.isdisjoint(i1)
    assert len(i0 | i1) == len(ds)

    # Reshuffling across epochs changes order deterministically.
    l0.set_epoch(0)
    e0 = l0._local_indices().tolist()
    l0.set_epoch(1)
    e1 = l0._local_indices().tolist()
    assert e0 != e1
    l0.set_epoch(0)
    assert l0._local_indices().tolist() == e0


def test_native_batch_assembly_golden(sample_files):
    """C/OpenMP assembler must reproduce the numpy path bit-for-bit-ish."""
    from bubbleformer_tpu.data import BubbleForecast
    from bubbleformer_tpu.data import native as native_mod

    if not native_mod.available():
        import pytest as _pytest

        _pytest.skip("no C compiler for the native assembler")

    kw = dict(
        input_fields=FIELDS, output_fields=FIELDS[:2], norm="std",
        downsample_factor=2, time_window=3, start_time=4,
        return_fluid_params=False,
    )
    ds = BubbleForecast(sample_files, **kw)
    ds.normalize()
    idx = np.array([0, 3, 40, len(ds) - 1])
    ref = ds.get_batch(idx)
    assert ds.enable_native()
    nat = ds.get_batch(idx)
    for a, b in zip(ref, nat):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # Stats agree with the streaming numpy implementation.
    import h5py

    with h5py.File(sample_files[0], "r") as f:
        data = np.asarray(f["dfun"], dtype=np.float32)
    st = native_mod.field_stats(data)
    np.testing.assert_allclose(st["mean"], data.mean(), rtol=1e-6)
    np.testing.assert_allclose(st["std"], data.std(), rtol=1e-5)


def test_grain_loader(sample_files):
    """Optional grain pipeline yields the same batch tuples."""
    from bubbleformer_tpu.data import BubbleForecast
    from bubbleformer_tpu.data.grain_pipeline import GRAIN_AVAILABLE, make_grain_loader

    if not GRAIN_AVAILABLE:
        pytest.skip("grain not installed")

    ds = BubbleForecast(
        sample_files, input_fields=FIELDS, output_fields=FIELDS, norm="none",
        time_window=2, start_time=5,
    )
    ds.normalize()
    loader = make_grain_loader(ds, batch_size=4, shuffle=True, seed=0, num_epochs=1)
    batch = next(iter(loader))
    assert batch[0].shape == (4, 2, 4, 32, 32)
    assert batch[1].shape == (4, 2, 4, 32, 32)


# ----------------------------------------------------------- ArrayRecord
@pytest.fixture(scope="module")
def arrayrecord_files(sample_files, tmp_path_factory):
    """Convert the synthetic trajectories to ArrayRecord shards."""
    pytest.importorskip("array_record")
    from scripts.convert_to_arrayrecord import convert_file

    out = str(tmp_path_factory.mktemp("arrec"))
    return [convert_file(src, out, FIELDS) for src in sample_files]


@pytest.mark.parametrize("norm,downsample", [("none", 1), ("std", 1), ("minmax", 2)])
def test_arrayrecord_matches_hdf5(sample_files, arrayrecord_files, norm, downsample):
    """ArrayRecordForecast must reproduce BubbleForecast samples exactly:
    same normalization constants (from sidecar stats, no scan) and same
    windows at every index."""
    from bubbleformer_tpu.data import BubbleForecast
    from bubbleformer_tpu.data.arrayrecord import ArrayRecordForecast

    kw = dict(
        input_fields=FIELDS, output_fields=FIELDS[:2], norm=norm,
        downsample_factor=downsample, time_window=3, start_time=4,
    )
    ref = BubbleForecast(sample_files, **kw)
    ref.normalize()
    ds = ArrayRecordForecast(arrayrecord_files, **kw)
    ds.normalize()

    assert len(ds) == len(ref)
    for field in ref.fields:
        np.testing.assert_allclose(ds.diff_terms[field], ref.diff_terms[field], rtol=1e-12)
        np.testing.assert_allclose(ds.div_terms[field], ref.div_terms[field], rtol=1e-12)
    for idx in [0, 1, len(ds) // 2, len(ds) - 1]:
        a, b = ref[idx], ds[idx]
        np.testing.assert_allclose(a[0], b[0], atol=1e-6)
        np.testing.assert_allclose(a[1], b[1], atol=1e-6)


def test_arrayrecord_fluid_params_and_loader(sample_files, arrayrecord_files):
    """Fluid params ride the sidecar; the thread-prefetch DataLoader works
    on top of the record dataset unchanged."""
    from bubbleformer_tpu.data import BubbleForecast, DataLoader
    from bubbleformer_tpu.data.arrayrecord import ArrayRecordForecast

    kw = dict(
        input_fields=FIELDS, output_fields=FIELDS, norm="none",
        time_window=2, start_time=5, return_fluid_params=True,
    )
    ref = BubbleForecast(sample_files, **kw)
    ds = ArrayRecordForecast(arrayrecord_files, **kw)
    ds.normalize()
    np.testing.assert_allclose(
        ds.fluid_params_vector(0), ref.fluid_params_vector(0), rtol=1e-12
    )

    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batch = next(iter(loader))
    assert batch[0].shape == (4, 2, 4, 32, 32)
    assert batch[2].shape == (4, 9)


def test_arrayrecord_float16_roundtrip(sample_files, tmp_path):
    """float16 shards halve size and decode to float32 within fp16 eps."""
    pytest.importorskip("array_record")
    from scripts.convert_to_arrayrecord import convert_file
    from bubbleformer_tpu.data import BubbleForecast
    from bubbleformer_tpu.data.arrayrecord import ArrayRecordForecast

    path16 = convert_file(sample_files[0], str(tmp_path), FIELDS, dtype="float16")
    kw = dict(input_fields=FIELDS, output_fields=FIELDS, norm="none",
              time_window=2, start_time=5)
    ref = BubbleForecast(sample_files[:1], **kw)
    ref.normalize()
    ds = ArrayRecordForecast([path16], **kw)
    ds.normalize()
    a, b = ref[0], ds[0]
    np.testing.assert_allclose(a[0], b[0], atol=2e-3)
