"""Forecast training modules: model + criterion + optimizer wiring.

Counterparts of the reference LightningModules
(``bubbleformer/modules.py:19-260`` ``ForecastModule``, ``:263-356``
``ConditionedForecastModule``) re-designed as *pure-function factories*: the
module owns configuration and builds (a) the initial train state and (b)
jittable ``train_step`` / ``eval_step`` functions closed over the model and
optimizer.  The Lightning Trainer's role (loop, logging, checkpoints,
preemption) lives in :mod:`bubbleformer_tpu.training.trainer`.

As in the reference (``modules.py:51-53``), the data config injects
``input_fields`` / ``output_fields`` / ``time_window`` sizes into the model
config before construction, and the training criterion is
``LpLoss(d=2, p=2, reduce_dims=[0,1,2], reductions=['mean','mean','sum'])``
(``modules.py:50``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from bubbleformer_tpu.models import get_model
from bubbleformer_tpu.training.optim import make_optimizer
from bubbleformer_tpu.utils.losses import LpLoss
from bubbleformer_tpu.utils.schedulers import make_schedule


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None


class ForecastModule:
    """Unconditioned forecasting: batch = (inp, tgt)."""

    conditioned = False

    def __init__(
        self,
        model_cfg: Dict[str, Any],
        data_cfg: Dict[str, Any],
        optim_cfg: Dict[str, Any],
        scheduler_cfg: Dict[str, Any],
        total_steps: int,
        normalization_constants: Optional[Tuple[Dict, Dict]] = None,
        compute_dtype: Optional[str] = None,
    ):
        self.model_cfg = dict(model_cfg)
        self.data_cfg = dict(data_cfg)
        self.optim_cfg = dict(optim_cfg)
        self.scheduler_cfg = dict(scheduler_cfg)
        self.total_steps = total_steps
        self.normalization_constants = normalization_constants

        params = dict(self.model_cfg.get("params", {}))
        params["input_fields"] = len(self.data_cfg["input_fields"])
        params["output_fields"] = len(self.data_cfg["output_fields"])
        params["time_window"] = self.data_cfg["time_window"]
        if compute_dtype is not None:
            params["dtype"] = jnp.dtype(compute_dtype)
        self.model_params_cfg = params
        self.model = get_model(self.model_cfg["name"], **params)

        self.criterion = LpLoss(
            d=2, p=2, reduce_dims=[0, 1, 2], reductions=["mean", "mean", "sum"]
        )

        opt_params = dict(self.optim_cfg.get("params", {}))
        opt_params.pop("use_triton", None)  # GPU-reference knob; jit fuses on TPU
        base_lr = opt_params.pop("lr")
        self.schedule = make_schedule(
            self.scheduler_cfg["name"],
            base_lr,
            total_steps,
            **self.scheduler_cfg.get("params", {}),
        )
        self.optimizer = make_optimizer(self.optim_cfg["name"], self.schedule, **opt_params)

    def _loss(self, pred, tgt):
        """Training criterion.  ``BUBBLEFORMER_LOSS_KERNEL=1`` routes the 5-D
        NCHW case through the Pallas plane-norm kernel (``ops/lp_loss.py``) —
        numerically the same LpLoss (golden-tested).  Off by default: the
        kernel was built to pin the loss operands to canonical layout and
        delete ~18 ms/step of loss-side relayouts seen in the 2026-08-19
        profile, but measured END-TO-END it regresses the flagship step
        107.3 -> 120.1 ms — the pin forces the decoder's output transpose to
        materialize ahead of the custom call, which costs more than the
        relayouts it deletes (negative result recorded in DESIGN.md)."""
        import os

        if (
            pred.ndim == 5
            and os.environ.get("BUBBLEFORMER_LOSS_KERNEL", "0") == "1"
            and jax.default_backend() == "tpu"
        ):
            from bubbleformer_tpu.ops.lp_loss import training_lp_loss

            return training_lp_loss(pred, tgt)
        return self.criterion(pred, tgt)

    # -- batch plumbing ------------------------------------------------------
    def apply(self, variables, batch, train: bool, rngs=None, mutable=False):
        inp = batch[0]
        return self.model.apply(variables, inp, train=train, rngs=rngs, mutable=mutable)

    def target(self, batch):
        return batch[1]

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        init_rngs = {"params": rng, "droppath": jax.random.fold_in(rng, 1)}
        dummy = jax.tree_util.tree_map(jnp.asarray, tuple(sample_batch))
        variables = self._init_variables(init_rngs, dummy)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            batch_stats=variables.get("batch_stats"),
        )

    def _init_variables(self, rngs, batch):
        inp = batch[0]
        if self.conditioned:
            return self.model.init(rngs, inp, batch[2], train=False)
        return self.model.init(rngs, inp, train=False)

    # -- steps ----------------------------------------------------------------
    def make_train_step(self):
        optimizer = self.optimizer
        schedule = self.schedule

        def train_step(state: TrainState, batch, rng: jax.Array):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                variables = {"params": params}
                mutable = False
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                out = self.apply(
                    variables,
                    batch,
                    train=True,
                    rngs={"droppath": step_rng},
                    mutable=mutable,
                )
                if mutable:
                    pred, updates = out
                    new_bs = updates.get("batch_stats")
                else:
                    pred, new_bs = out, None
                loss = self._loss(pred, self.target(batch))
                return loss, new_bs

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                batch_stats=new_bs if new_bs is not None else state.batch_stats,
            )
            metrics = {"loss": loss, "learning_rate": schedule(state.step)}
            return new_state, metrics

        return train_step

    def make_eval_step(self):
        def eval_step(state: TrainState, batch):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            pred = self.apply(variables, batch, train=False)
            return {"loss": self._loss(pred, self.target(batch))}, pred

        return eval_step


class ConditionedForecastModule(ForecastModule):
    """FiLM-conditioned forecasting: batch = (inp, tgt, fluid_params)."""

    conditioned = True

    def apply(self, variables, batch, train: bool, rngs=None, mutable=False):
        inp, _, cond = batch[0], batch[1], batch[2]
        return self.model.apply(
            variables, inp, cond, train=train, rngs=rngs, mutable=mutable
        )
