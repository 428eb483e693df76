"""Flash-X ingestion tests over synthetic AMR checkpoint files."""
import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import flashx_util


def _string_table(pairs):
    return np.array(
        [(k.encode().ljust(32), v.encode().ljust(32)) for k, v in pairs],
        dtype=[("name", "S32"), ("value", "S32")],
    )


def _real_table(pairs):
    return np.array(
        [(k.encode().ljust(32), v) for k, v in pairs],
        dtype=[("name", "S32"), ("value", "<f8")],
    )


def _int_table(pairs):
    return np.array(
        [(k.encode().ljust(32), v) for k, v in pairs],
        dtype=[("name", "S32"), ("value", "<i4")],
    )


@pytest.fixture
def synthetic_sim(tmp_path):
    """A fake 2-frame Flash-X sim: 2x2 blocks of 8x8 cells, linear fields."""
    sim_dir = tmp_path / "Twall_99"
    sim_dir.mkdir()
    nxb = nyb = 8
    nblockx = nblocky = 2
    nx, ny = nxb * nblockx, nyb * nblocky
    xmin, xmax, ymin, ymax = -1.0, 1.0, 0.0, 2.0

    rng = np.random.default_rng(0)
    # Ground-truth full fields; f(t, y, x) distinguishable per position.
    full = {
        "dfun": rng.standard_normal((2, ny, nx)).astype(np.float64),
        "temp": rng.standard_normal((2, ny, nx)).astype(np.float64),
        "velx": rng.standard_normal((2, ny, nx)).astype(np.float64),
        "vely": rng.standard_normal((2, ny, nx)).astype(np.float64),
    }

    # Block decomposition: row-major blocks with bounding boxes.
    bboxes = []
    block_slices = []
    for by in range(nblocky):
        for bx in range(nblockx):
            x0 = xmin + bx * (xmax - xmin) / nblockx
            x1 = xmin + (bx + 1) * (xmax - xmin) / nblockx
            y0 = ymin + by * (ymax - ymin) / nblocky
            y1 = ymin + (by + 1) * (ymax - ymin) / nblocky
            bboxes.append([[x0, x1], [y0, y1]])
            block_slices.append((slice(by * nyb, (by + 1) * nyb), slice(bx * nxb, (bx + 1) * nxb)))
    bbox_arr = np.array(bboxes)  # (nblocks, 2, 2)

    for t in range(2):
        with h5py.File(sim_dir / f"sim_hdf5_chk_{t:04d}", "w") as f:
            f["string runtime parameters"] = _string_table(
                [("geometry", "cartesian")]
                + [(f"{s}_boundary_type", "noslip_ins") for s in ("xl", "xr", "yl", "yr")]
            )
            f["real runtime parameters"] = _real_table(
                [
                    ("checkpointfileintervaltime", 0.1),
                    ("tinitial", 0.0),
                    ("tmax", 10.0),
                    ("xmin", xmin), ("xmax", xmax), ("ymin", ymin), ("ymax", ymax),
                    ("ins_gravx", 0.0), ("ins_gravy", -1.0), ("ins_gravz", 0.0),
                    ("ht_prandtl", 8.34), ("ins_invreynolds", 0.0084),
                    ("ins_inflowvelscale", 0.0),
                    ("mph_cpgas", 0.83), ("mph_mugas", 1.0), ("mph_rhogas", 0.0083),
                    ("mph_thcogas", 0.25), ("mph_stefan", 0.063),
                ]
            )
            f["integer runtime parameters"] = _int_table(
                [("nblockx", nblockx), ("nblocky", nblocky)]
            )
            f["integer scalars"] = _int_table([("nxb", nxb), ("nyb", nyb)])
            f["bounding box"] = bbox_arr
            for var in ("dfun", "temp", "velx", "vely"):
                blocks = np.stack(
                    [full[var][t][sl].reshape(1, nyb, nxb) for sl in block_slices]
                )
                f[var] = blocks

    with h5py.File(sim_dir / "sim_htr_0001", "w") as f:
        f["heater/wallTemp"] = np.array([99.0])
        f["heater/nucWaitTime"] = np.array([0.4])
        f["init/radii"] = np.array([0.1, 0.2])
        f["site/x"] = np.array([0.0])
        f["site/y"] = np.array([0.0])

    return sim_dir, full, (nx, ny)


def test_flashx_ingestion(synthetic_sim, tmp_path):
    sim_dir, full, (nx, ny) = synthetic_sim
    out_path = str(tmp_path / "out.hdf5")
    params = flashx_util.process_sim(str(sim_dir), out_path, n_jobs=1)

    assert params["heater"]["wallTemp"] == 99.0
    assert params["prandtl"] == 8.34
    assert params["num_blocks_x"] == 2 and params["nx_block"] == 8

    with h5py.File(out_path, "r") as f:
        for var, ref_name in [("dfun", "dfun"), ("temperature", "temp"),
                              ("velx", "velx"), ("vely", "vely")]:
            data = np.asarray(f[var])
            assert data.shape == (2, ny, nx)
            np.testing.assert_allclose(data, full[ref_name].astype(np.float32), atol=1e-6)
        assert f["x_centers"].shape == (nx,)
        assert f["velfacex"].shape == (2, ny, nx + 1)


def test_flashx_parameters_roundtrip(synthetic_sim, tmp_path):
    """The written sidecar JSON must satisfy the dataset's fluid-param needs."""
    import json

    sim_dir, _, _ = synthetic_sim
    out_path = str(tmp_path / "sim.hdf5")
    params = flashx_util.process_sim(str(sim_dir), out_path, n_jobs=1)
    with open(out_path.replace(".hdf5", ".json"), "w") as f:
        json.dump(params, f, default=str)

    from bubbleformer_tpu.data import BubbleForecast

    ds = BubbleForecast(
        [out_path],
        input_fields=["dfun", "temperature"],
        output_fields=["dfun"],
        norm="none",
        time_window=1,
        start_time=0,
        return_fluid_params=True,
    )
    ds.normalize()
    vec = ds.fluid_params_vector(0)
    assert vec.shape == (9,)
    assert vec[-1] == 99.0  # wallTemp
