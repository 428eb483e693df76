#!/usr/bin/env python3
"""Training entry point.

TPU-native counterpart of reference ``scripts/train.py:69-217``: composes the
YAML config groups with CLI overrides, builds the sliding-window datasets and
loaders, picks the (conditioned) forecast module, and runs the jitted train
loop with preemption checkpointing.

Usage (mirrors the reference CLI):

    python scripts/train.py max_epochs=400 batch_size=8 \
        data_cfg=poolboiling_saturated model_cfg=avit_big optim_cfg=adamw

Multi-host TPU needs no launcher plugin: every process runs this script and
``jax.distributed.initialize()`` wires the topology (replaces the reference's
SLURMEnvironment/DDP bootstrap at ``train.py:158-166``).
"""
from __future__ import annotations

import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Honor JAX_PLATFORMS even when an installed TPU plugin would override it
# (the CPU-mesh e2e tests drive this CLI as a subprocess on the host
# platform; in-process config wins where the env var alone does not).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache (full-step XLA compiles are minutes through
# remote-compile relays; cached executables rerun in seconds).
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np

from bubbleformer_tpu.config import load_config
from bubbleformer_tpu.data import BubbleForecast, DataLoader
from bubbleformer_tpu.parallel import initialize_distributed, is_leader, make_mesh
from bubbleformer_tpu.training import (
    ConditionedForecastModule,
    ForecastModule,
    Trainer,
    next_preempt_ckpt_path,
)


def main(argv=None) -> None:
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    initialize_distributed()

    np.random.seed(cfg["seed"])

    data_cfg = cfg["data_cfg"]
    model_cfg = cfg["model_cfg"]

    # Log-dir naming mirrors reference train.py:83-96.
    if cfg.get("checkpoint_path"):
        ckpt_path = cfg["checkpoint_path"]
        log_dir = os.path.dirname(ckpt_path)
    else:
        ckpt_path = None
        job_id = os.getenv("SLURM_JOB_ID") or os.getenv("JOB_ID") or "local"
        log_id = f"{model_cfg['name'].lower()}_{data_cfg['dataset'].lower()}_{job_id}"
        log_dir = os.path.join(cfg["log_dir"], log_id)
        os.makedirs(log_dir, exist_ok=True)
    preempt_path = next_preempt_ckpt_path(log_dir, ckpt_path)

    common = dict(
        input_fields=data_cfg["input_fields"],
        output_fields=data_cfg["output_fields"],
        norm=data_cfg["normalize"],
        downsample_factor=data_cfg["downsample_factor"],
        time_window=data_cfg["time_window"],
        start_time=data_cfg["start_time"],
        return_fluid_params=data_cfg["return_fluid_params"],
    )
    train_dataset = BubbleForecast(filenames=data_cfg["train_paths"], **common)
    normalization_constants = train_dataset.normalize()
    val_dataset = BubbleForecast(filenames=data_cfg["val_paths"], **common)
    val_dataset.normalize(*normalization_constants)
    if cfg.get("native_loader", True):
        # C/OpenMP batch assembly over memory-mapped field caches (falls back
        # to the numpy path when no C compiler is available).
        used_native = train_dataset.enable_native() and val_dataset.enable_native()
        if is_leader():
            print(f"native loader: {'enabled' if used_native else 'unavailable'}")

    loader_common = dict(
        batch_size=cfg["batch_size"],
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    train_loader = DataLoader(
        train_dataset, shuffle=True, seed=cfg["seed"], num_workers=8, **loader_common
    )
    val_loader = DataLoader(val_dataset, shuffle=False, num_workers=4, **loader_common)

    limit_train = cfg.get("limit_train_batches", 1000)
    steps_per_epoch = min(len(train_loader), limit_train)
    total_steps = steps_per_epoch * cfg["max_epochs"]
    # One line per host at startup (the DDP-style world report): rank, world
    # size, local shard size, and the resulting global batch.
    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{len(train_loader)} train batches/epoch, local batch "
        f"{cfg['batch_size']} (global {cfg['batch_size'] * jax.process_count()})",
        flush=True,
    )

    # Strategy-via-config (the reference exposes its distributed strategy
    # entirely through Trainer config, reference train.py:159-166): the mesh
    # group picks DP/TP/SP; a spatial>1 axis auto-enables the model's
    # sequence-parallel sharding hints.
    mesh_cfg = cfg.get("mesh_cfg", {"data": -1, "model": 1})
    spatial = mesh_cfg.get("spatial", 1)
    mesh = make_mesh(
        data=mesh_cfg.get("data", -1),
        model=mesh_cfg.get("model", 1),
        spatial=spatial,
    )
    if spatial > 1 and model_cfg["name"].lower() in ("avit", "filmavit"):
        model_cfg["params"].setdefault("spatial_shard_axis", "spatial")

    module_cls = (
        ConditionedForecastModule
        if data_cfg["return_fluid_params"]
        else ForecastModule
    )
    module = module_cls(
        model_cfg=model_cfg,
        data_cfg=data_cfg,
        optim_cfg=cfg["optim_cfg"],
        scheduler_cfg=cfg["scheduler_cfg"],
        total_steps=total_steps,
        normalization_constants=normalization_constants,
        compute_dtype=cfg.get("compute_dtype"),
        loss_layout=cfg.get("loss_layout"),
    )

    use_wandb = cfg.get("use_wandb", False)
    trainer = Trainer(
        module,
        log_dir=log_dir,
        mesh=mesh,
        limit_train_batches=limit_train,
        limit_val_batches=cfg.get("limit_val_batches", 25),
        seed=cfg["seed"],
        use_wandb=use_wandb,
        preempt_ckpt_path=preempt_path,
        # Observability knobs (reference logs val image panels every epoch
        # when W&B is on, modules.py:197-253 — same default here).
        plot_val_samples=(
            use_wandb
            if cfg.get("plot_val_samples") is None
            else bool(cfg["plot_val_samples"])
        ),
        profile_dir=cfg.get("profile_dir") or None,
        transfer_dtype=cfg.get("transfer_dtype") or None,
    )

    if is_leader():
        pprint.PrettyPrinter(depth=4).pprint(cfg)

    trainer.fit(
        train_loader,
        val_loader,
        max_epochs=cfg["max_epochs"],
        ckpt_path=ckpt_path,
    )


if __name__ == "__main__":
    main()
