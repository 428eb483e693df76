#!/usr/bin/env python3
"""Flash-X checkpoint ingestion: AMR block files -> flat regular-grid HDF5.

Counterpart of reference ``scripts/flashx_util.py:11-168``, implemented
directly on h5py (no boxkit dependency): parses the runtime-parameter tables
and heater file, computes the uniform grid geometry, places every AMR block
into a flat (Ny, Nx) array per field and timestep (face-staggered velocities
special-cased), and writes one flat HDF5 per simulation plus a consolidated
``parameters.json`` with the thermophysical parameters / heater config /
nucleation sites the FiLM-conditioned models consume.

    python scripts/flashx_util.py --sim_dir raw/ --output_dir flat/
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from concurrent.futures import ProcessPoolExecutor

import h5py
import numpy as np

# Flash-X variable name -> output dataset name (reference flashx_util.py:38-43).
LOAD_VARS = [
    "dfun", "temp", "velx", "vely", "nrmx", "nrmy",
    "mflx", "dust", "rhoc", "pres", "fcx8", "fcy8",
]
SAVE_VARS = [
    "dfun", "temperature", "velx", "vely", "normx", "normy",
    "massflux", "divergence", "density", "pressure", "velfacex", "velfacey",
]


def _decode_table(table) -> dict:
    """Flash-X runtime-parameter tables are (name, value) record arrays."""
    out = {}
    for row in table:
        key = row[0].decode("utf-8").strip() if isinstance(row[0], bytes) else str(row[0]).strip()
        val = row[1]
        if isinstance(val, bytes):
            val = val.decode("utf-8").strip()
        out[key] = val
    return out


def read_sim_parameters(chk_path: str, heater_path: str) -> dict:
    """Geometry + thermophysical parameters + heater config for one sim."""
    with h5py.File(chk_path, "r") as frame:
        string_params = _decode_table(frame["string runtime parameters"][()])
        real_params = _decode_table(frame["real runtime parameters"][()])
        integer_params = _decode_table(frame["integer runtime parameters"][()])
        integer_scalars = _decode_table(frame["integer scalars"][()])

    with h5py.File(heater_path, "r") as heater:
        heater_cfg = {k: heater["heater"][k][()].tolist()[0] for k in heater["heater"].keys()}
        nuc_seed_radii = heater["init"]["radii"][()].tolist()
        nuc_sites_x = heater["site"]["x"][()].tolist()
        nuc_sites_y = heater["site"]["y"][()].tolist()

    return {
        "geometry": string_params["geometry"],
        "xl_boundary_type": string_params["xl_boundary_type"],
        "xr_boundary_type": string_params["xr_boundary_type"],
        "yl_boundary_type": string_params["yl_boundary_type"],
        "yr_boundary_type": string_params["yr_boundary_type"],
        "num_blocks_x": int(integer_params["nblockx"]),
        "num_blocks_y": int(integer_params["nblocky"]),
        "nx_block": int(integer_scalars["nxb"]),
        "ny_block": int(integer_scalars["nyb"]),
        "dt": float(real_params["checkpointfileintervaltime"]),
        "t_initial": float(real_params["tinitial"]),
        "t_final": float(real_params["tmax"]),
        "x_min": float(real_params["xmin"]),
        "x_max": float(real_params["xmax"]),
        "y_min": float(real_params["ymin"]),
        "y_max": float(real_params["ymax"]),
        "gravx": float(real_params["ins_gravx"]),
        "gravy": float(real_params["ins_gravy"]),
        "gravz": float(real_params["ins_gravz"]),
        "prandtl": float(real_params["ht_prandtl"]),
        "inv_reynolds": float(real_params["ins_invreynolds"]),
        "inflow_velscale": float(real_params.get("ins_inflowvelscale", 0.0)),
        "cpgas": float(real_params["mph_cpgas"]),
        "mugas": float(real_params["mph_mugas"]),
        "rhogas": float(real_params["mph_rhogas"]),
        "thcogas": float(real_params["mph_thcogas"]),
        "stefan": float(real_params["mph_stefan"]),
        "heater": heater_cfg,
        "nuc_seed_radii": nuc_seed_radii,
        "nuc_sites_x": nuc_sites_x,
        "nuc_sites_y": nuc_sites_y,
    }


def flatten_frame(args) -> dict:
    """Place one checkpoint's AMR blocks into flat (Ny, Nx) field arrays."""
    filename, params = args
    nxb, nyb = params["nx_block"], params["ny_block"]
    nx_total = params["num_blocks_x"] * nxb
    ny_total = params["num_blocks_y"] * nyb
    xmin, xmax = params["x_min"], params["x_max"]
    ymin, ymax = params["y_min"], params["y_max"]

    flat = {
        sv: np.zeros((ny_total, nx_total), dtype=np.float32)
        for sv in SAVE_VARS
        if sv not in ("velfacex", "velfacey")
    }
    flat["velfacex"] = np.zeros((ny_total, nx_total + 1), dtype=np.float32)
    flat["velfacey"] = np.zeros((ny_total + 1, nx_total), dtype=np.float32)

    with h5py.File(filename, "r") as f:
        bbox = f["bounding box"][()]  # (nblocks, ndim, 2)
        for load_var, save_var in zip(LOAD_VARS, SAVE_VARS):
            if load_var not in f:
                continue
            blocks = f[load_var]
            for i in range(blocks.shape[0]):
                bx = bbox[i, 0, :].min()
                by = bbox[i, 1, :].min()
                # Snap the block origin to the uniform grid (leaf blocks of a
                # uniform-refinement run tile the domain exactly).
                r = nyb * round(int(ny_total * (by - ymin) / (ymax - ymin)) / nyb)
                c = nxb * round(int(nx_total * (bx - xmin) / (xmax - xmin)) / nxb)
                block = np.asarray(blocks[i][0], dtype=np.float32)  # (nz=1 squeezed)
                if load_var == "fcx8":
                    flat[save_var][r : r + nyb, c : c + nxb] = block[:, :-1]
                elif load_var == "fcy8":
                    flat[save_var][r : r + nyb, c : c + nxb] = block[:-1, :]
                else:
                    flat[save_var][r : r + nyb, c : c + nxb] = block

    # Extrapolate the last face column/row from cell-centered velocities
    # (reference flashx_util.py:141-142).
    flat["velfacex"][:, -1] = 2 * flat["velx"][:, -1] - flat["velfacex"][:, -2]
    flat["velfacey"][-1, :] = 2 * flat["vely"][-1, :] - flat["velfacey"][-2, :]
    return flat


def process_sim(sim_dir: str, output_path: str, n_jobs: int | None = None) -> dict:
    filenames = glob.glob(os.path.join(sim_dir, "*"))
    chk_files = sorted(f for f in filenames if "chk" in os.path.basename(f))
    heater_files = [f for f in filenames if "htr" in os.path.basename(f)]
    if not chk_files or not heater_files:
        raise FileNotFoundError(f"no chk/htr files in {sim_dir}")

    params = read_sim_parameters(chk_files[0], heater_files[0])

    nxb = params["num_blocks_x"] * params["nx_block"]
    nyb = params["num_blocks_y"] * params["ny_block"]
    x_faces = np.linspace(params["x_min"], params["x_max"], nxb + 1)
    y_faces = np.linspace(params["y_min"], params["y_max"], nyb + 1)

    with ProcessPoolExecutor(max_workers=n_jobs) as pool:
        frames = list(pool.map(flatten_frame, [(f, params) for f in chk_files]))

    with h5py.File(output_path, "w") as out:
        out.create_dataset("x_faces", data=x_faces)
        out.create_dataset("y_faces", data=y_faces)
        out.create_dataset("x_centers", data=0.5 * (x_faces[1:] + x_faces[:-1]))
        out.create_dataset("y_centers", data=0.5 * (y_faces[1:] + y_faces[:-1]))
        for sv in SAVE_VARS:
            stacked = np.stack([fr[sv] for fr in frames]).astype(np.float32)
            out.create_dataset(sv, data=stacked)
            print(f"{sv}: {stacked.shape}")
    return params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sim_dir", type=str, required=True)
    ap.add_argument("--output_dir", type=str, required=True)
    ap.add_argument("--jobs", type=int, default=None)
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    sims = [d for d in os.listdir(args.sim_dir) if "Twall" in d]
    all_params = []
    for sim in sims:
        print(f"Processing {sim}")
        out_path = os.path.join(args.output_dir, sim + ".hdf5")
        params = process_sim(os.path.join(args.sim_dir, sim), out_path, args.jobs)
        all_params.append(params)
        # Per-sim sidecar JSON (the dataset's fluid-param source,
        # reference dataset.py:61-66).
        with open(out_path.replace(".hdf5", ".json"), "w") as f:
            json.dump(params, f, indent=4, default=str)
        print(f"Wrote {sim} to {args.output_dir}")

    with open(os.path.join(args.output_dir, "parameters.json"), "w") as f:
        json.dump(all_params, f, indent=4, default=str)
    print("Processing complete.")


if __name__ == "__main__":
    main()
