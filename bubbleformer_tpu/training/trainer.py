"""The training loop: jitted steps over a device mesh.

Replaces the Lightning ``Trainer`` (reference ``scripts/train.py:158-172``)
with an explicit loop around a donated, jitted train step:

* batches are placed with a ``data``-axis NamedSharding; parameters live on
  the mesh under the tensor-parallel rules of
  :mod:`bubbleformer_tpu.parallel.sharding` (replicated when ``model=1``) —
  gradient all-reduce is the XLA ``psum`` GSPMD inserts, not a comm library;
* ``limit_train_batches`` / ``limit_val_batches`` match the reference's
  epoch budgeting (``train.py:168-169``);
* CSV metrics + optional W&B (leader-gated, like ``modules.py:103-104``);
* SIGTERM preemption checkpointing with numbered resume paths
  (``train.py:36-67,91-96``) via Orbax.
"""
from __future__ import annotations

import csv
import os
import signal
import time
import warnings
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bubbleformer_tpu.parallel.mesh import batch_sharding, is_leader, make_mesh
from bubbleformer_tpu.parallel.sharding import shard_params
from bubbleformer_tpu.training.checkpoint import CheckpointManager
from bubbleformer_tpu.training.module import ForecastModule, TrainState


class CSVLogger:
    """Append-only metrics CSV (replaces Lightning CSVLogger)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.csv")
        self._header_written = os.path.exists(self.path)

    def log(self, row: Dict[str, Any]) -> None:
        write_header = not self._header_written
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row.keys()))
            if write_header:
                writer.writeheader()
                self._header_written = True
            writer.writerow(row)


class Trainer:
    """Explicit jit train/val loop with checkpointing and preemption."""

    def __init__(
        self,
        module: ForecastModule,
        log_dir: str = "logs",
        mesh=None,
        limit_train_batches: int = 1000,
        limit_val_batches: int = 25,
        seed: int = 42,
        use_wandb: bool = False,
        checkpoint_every_n_epochs: int = 1,
        preempt_ckpt_path: Optional[str] = None,
        async_checkpoint: bool = True,
        plot_val_samples: bool = False,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
        transfer_dtype: Optional[str] = None,
    ):
        self.module = module
        self.log_dir = log_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.seed = seed
        self.logger = CSVLogger(log_dir) if is_leader() else None
        self.ckpt = CheckpointManager(use_async=async_checkpoint)
        self.preempt_ckpt_path = preempt_ckpt_path or os.path.join(log_dir, "hpc_ckpt_1")
        self._preempted = False
        self.plot_val_samples = plot_val_samples
        # Optional bf16 host->device transfer (halves batch bytes; the loss
        # then sees bf16-quantized targets — off by default for exactness).
        self.transfer_dtype = transfer_dtype
        # jax.profiler trace window (replaces the reference's coarse
        # wall-clock-only timing, SURVEY.md §5 tracing/profiling gap).
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        self._batch_sharding = batch_sharding(self.mesh)
        # Steps trace inside the ambient mesh so bare-PartitionSpec sharding
        # constraints (e.g. the model's spatial_shard_axis) resolve.
        _train = jax.jit(module.make_train_step(), donate_argnums=0)
        _eval = jax.jit(module.make_eval_step())

        def train_in_mesh(*a):
            with jax.set_mesh(self.mesh):
                return _train(*a)

        def eval_in_mesh(*a):
            with jax.set_mesh(self.mesh):
                return _eval(*a)

        self._train_step = train_in_mesh
        self._eval_step = eval_in_mesh

        self.wandb = None
        if use_wandb and is_leader():
            try:
                import wandb  # noqa: F401  (optional dependency)

                # Key file convention and resume="auto" mirror the reference
                # (train.py:178-196); both are optional.
                key_path = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "config",
                    "wandb_api_key.txt",
                )
                if os.path.exists(key_path):
                    with open(key_path, "r", encoding="utf-8") as f:
                        wandb.login(key=f.read().strip())
                wandb.init(
                    project="bubbleformer_tpu",
                    name=os.path.basename(os.path.abspath(log_dir)),
                    dir=log_dir,
                    resume="auto",
                )
                self.wandb = wandb
            except Exception as e:  # noqa: BLE001 — wandb must never kill a run
                print(f"wandb unavailable ({e}); continuing with CSV logging only")

        signal.signal(signal.SIGTERM, self._handle_preemption)

    # -- preemption ----------------------------------------------------------
    def _handle_preemption(self, signum, frame):
        # Only flag here; the step boundary performs the actual save so the
        # checkpoint is a consistent post-update state.
        self._preempted = True

    def _save_preempt_checkpoint(self, state: TrainState) -> None:
        self.ckpt.save(
            self.preempt_ckpt_path, state, self.module.normalization_constants
        )
        self.ckpt.wait()
        if is_leader():
            print(f"Preemption checkpoint saved to {self.preempt_ckpt_path}")

    # -- device placement ----------------------------------------------------
    def _put_batch(self, batch) -> Tuple[jax.Array, ...]:
        parts = []
        pc = jax.process_count()
        for part in batch:
            arr = np.asarray(part)
            if self.transfer_dtype is not None and arr.dtype == np.float32:
                # Halve host->device bytes; the model computes in bf16 anyway.
                import ml_dtypes

                arr = arr.astype(ml_dtypes.bfloat16)
            if pc > 1:
                # Each process's loader yields its own disjoint shard of the
                # global permutation; the global batch is their concatenation
                # along the data axis (per-process batch_size B -> global
                # B * process_count).  A plain device_put here would treat the
                # LOCAL batch as the global array and silently drop every row
                # this process does not address.
                parts.append(
                    jax.make_array_from_process_local_data(
                        self._batch_sharding,
                        arr,
                        global_shape=(arr.shape[0] * pc,) + arr.shape[1:],
                    )
                )
            else:
                parts.append(jax.device_put(arr, self._batch_sharding))
        return tuple(parts)

    def _device_prefetch(self, iterable, limit: int):
        """Yield device-resident batches one transfer ahead of consumption.

        The host->device copy of batch i+1 is issued before batch i is
        consumed, so the transfer overlaps the jitted step (the standard
        flax prefetch pattern; essential when transfer latency is nontrivial).
        """
        pending = None
        for i, batch in enumerate(iterable):
            if i >= limit:
                break
            current = self._put_batch(batch)
            if pending is not None:
                yield pending
            pending = current
        if pending is not None:
            yield pending

    def init_state(self, sample_batch) -> TrainState:
        rng = jax.random.key(self.seed)
        with jax.set_mesh(self.mesh):
            state = self.module.init_state(rng, sample_batch)
        # Place parameters under the mesh partitioning rules (replicated on a
        # pure-data mesh) and replicate the rest of the state accordingly.
        # The opt-state placement must name its sharding explicitly: in a
        # multi-process world the freshly-initialized leaves are global
        # arrays, and a bare device_put (= copy to the default local device)
        # rejects non-addressable inputs.
        from bubbleformer_tpu.parallel.mesh import replicated

        repl = replicated(self.mesh)
        return state.replace(
            params=shard_params(state.params, self.mesh),
            opt_state=jax.tree.map(lambda x: jax.device_put(x, repl), state.opt_state),
        )

    def restore(self, ckpt_path: str, sample_batch) -> TrainState:
        rng = jax.random.key(self.seed)
        with jax.set_mesh(self.mesh):
            target = self.module.init_state(rng, sample_batch)
        norm_example = self.module.normalization_constants
        try:
            state, norm = self.ckpt.restore(ckpt_path, target, norm_example)
        except Exception:
            # Checkpoint-format compatibility: checkpoints written before the
            # flatten_2d optimizer buffer (round 4) hold the optimizer state
            # as optax.flatten's 1-D vector — a different pytree than the
            # current init's padded (rows, 1024) buffer, so the full-state
            # restore fails structurally.  Recover the params (+ norm
            # constants) and re-initialize the optimizer state fresh;
            # momentum restarts, which is the honest fallback.
            params, norm = self.ckpt.restore_params(
                ckpt_path, target.params, norm_example
            )
            warnings.warn(
                f"full-state restore of {ckpt_path} failed (likely a legacy "
                "pre-flatten_2d optimizer-state layout); restored params only "
                "and re-initialized the optimizer state (momentum reset)."
            )
            state = target.replace(
                params=params, opt_state=self.module.optimizer.init(params)
            )
        if norm is not None:
            self.module.normalization_constants = norm
        return state

    def _log_val_images(self, val_sample, epoch: int) -> None:
        """Per-epoch validation image panels (reference ``modules.py:197-253``).

        Renders SDF (with interface overlay), temperature and velocity panels
        of the first validation sample's target vs prediction, to the log dir
        and (when enabled) to W&B.
        """
        if not (self.plot_val_samples and is_leader()):
            return
        from bubbleformer_tpu.utils import plot_utils

        batch, pred = val_sample
        fields = self.module.data_cfg["output_fields"]
        target = np.asarray(self.module.target(batch)[0])  # (T, C, H, W)
        pred = np.asarray(pred[0])

        out_dir = os.path.join(self.log_dir, f"val_epoch_{epoch}")
        os.makedirs(out_dir, exist_ok=True)
        figs = {}
        if "dfun" in fields:
            c = fields.index("dfun")
            figs["target_sdf"] = plot_utils.sdf_panel(target[:, c])
            figs["pred_sdf"] = plot_utils.sdf_panel(pred[:, c])
        if "temperature" in fields:
            c = fields.index("temperature")
            figs["target_temp"] = plot_utils.temp_panel(target[:, c])
            figs["pred_temp"] = plot_utils.temp_panel(pred[:, c])
        if "velx" in fields and "vely" in fields:
            cx, cy = fields.index("velx"), fields.index("vely")
            tvel = np.stack([target[:, cx], target[:, cy]], axis=1)
            pvel = np.stack([pred[:, cx], pred[:, cy]], axis=1)
            figs["target_vel"] = plot_utils.vel_panel(tvel)
            figs["pred_vel"] = plot_utils.vel_panel(pvel)
        import matplotlib.pyplot as plt

        for name, fig in figs.items():
            fig.savefig(os.path.join(out_dir, f"{name}.png"), bbox_inches="tight")
            if self.wandb is not None:
                self.wandb.log({name: self.wandb.Image(fig, caption=f"Epc {epoch}")})
            plt.close(fig)

    # -- the loop --------------------------------------------------------------
    def fit(
        self,
        train_loader,
        val_loader=None,
        max_epochs: int = 1,
        ckpt_path: Optional[str] = None,
        state: Optional[TrainState] = None,
    ) -> TrainState:
        first = None
        for first in train_loader:
            break
        if first is None:
            raise ValueError("empty training loader")

        if state is None:
            if ckpt_path:
                state = self.restore(ckpt_path, first)
            else:
                state = self.init_state(first)
            if is_leader():
                from bubbleformer_tpu.utils.summary import parameter_table

                print(parameter_table(state.params))

        rng = jax.random.key(self.seed + 1)
        global_step = int(state.step)
        start_epoch = global_step // max(
            min(self.limit_train_batches, len(train_loader)), 1
        )

        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(epoch)
            epoch_start = time.time()
            n_batches = 0
            epoch_loss = 0.0
            for i, batch in enumerate(
                self._device_prefetch(train_loader, self.limit_train_batches)
            ):
                if self.profile_dir and global_step == self.profile_steps[0]:
                    jax.profiler.start_trace(self.profile_dir)
                state, metrics = self._train_step(state, batch, rng)
                n_batches += 1
                global_step += 1
                if self.profile_dir and global_step == self.profile_steps[1]:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()

                if self._preempted:
                    self._save_preempt_checkpoint(state)
                    return state

                if self.logger is not None and (i % 10 == 0 or i == 0):
                    loss = float(metrics["loss"])
                    lr = float(metrics["learning_rate"])
                    if not np.isfinite(loss):
                        # Failure detection: snapshot the diverged state for
                        # post-mortem and stop instead of burning the job.
                        crash_path = os.path.join(self.log_dir, "non_finite_state")
                        self.ckpt.save(
                            crash_path, state, self.module.normalization_constants
                        )
                        self.ckpt.wait()
                        raise FloatingPointError(
                            f"non-finite loss {loss} at step {global_step}; "
                            f"state saved to {crash_path}"
                        )
                    epoch_loss += loss
                    self.logger.log(
                        {
                            "step": global_step,
                            "epoch": epoch,
                            "split": "train",
                            "loss": loss,
                            "learning_rate": lr,
                        }
                    )
                    if self.wandb is not None:
                        self.wandb.log({"train_loss": loss, "learning_rate": lr})

            train_time = time.time() - epoch_start
            if self.logger is not None and n_batches:
                batch_size = int(np.asarray(first[0]).shape[0])
                samples_per_sec = n_batches * batch_size / train_time
                print(
                    f"epoch {epoch}: {n_batches} steps in {train_time:.1f}s "
                    f"({samples_per_sec:.1f} samples/s incl. input pipeline)"
                )
            if self.wandb is not None:
                self.wandb.log({"train_epoch_time": train_time, "epoch": epoch})

            if val_loader is not None:
                val_start = time.time()
                val_losses = []
                val_sample = None
                for i, batch in enumerate(
                    self._device_prefetch(val_loader, self.limit_val_batches)
                ):
                    metrics, pred = self._eval_step(state, batch)
                    val_losses.append(float(metrics["loss"]))
                    if i == 0:
                        val_sample = (batch, pred)
                if val_sample is not None:
                    self._log_val_images(val_sample, epoch)
                if val_losses and self.logger is not None:
                    val_loss = float(np.mean(val_losses))
                    self.logger.log(
                        {
                            "step": global_step,
                            "epoch": epoch,
                            "split": "val",
                            "loss": val_loss,
                            "learning_rate": float("nan"),
                        }
                    )
                    if self.wandb is not None:
                        self.wandb.log(
                            {
                                "val_loss": val_loss,
                                "val_epoch_time": time.time() - val_start,
                                "epoch": epoch,
                            }
                        )

            self.ckpt.save(
                os.path.join(self.log_dir, "last"),
                state,
                self.module.normalization_constants,
            )

        self.ckpt.wait()
        return state
