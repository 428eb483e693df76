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
        loss_layout: Optional[str] = None,
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

        # Training-loss layout.  "nhwc" makes the TRAIN step consume the
        # decoder pyramid's native channels-last output and computes the
        # same relative-L2 criterion with its (H, W) plane sums over axes
        # (2, 3) — the API/eval path stays (B, T, C, H, W).  This deletes
        # the decoder's channels-first output fold and the loss-side f32
        # relayouts from the train program entirely (the ~18 ms/step the
        # 2026-08-19 profile attributed to the loss side; the Pallas
        # layout-pin kernel attacked the same cost and lost, DESIGN.md).
        # None -> BUBBLEFORMER_LOSS_LAYOUT env or "nchw".
        import os

        if loss_layout is None:
            loss_layout = os.environ.get("BUBBLEFORMER_LOSS_LAYOUT", "nchw")
        if loss_layout not in ("nchw", "nhwc"):
            raise ValueError(f"loss_layout must be nchw|nhwc, got {loss_layout!r}")
        self.loss_layout = loss_layout
        if loss_layout == "nhwc" and not getattr(
            self.model, "supports_output_layout", False
        ):
            # Loud fallback: silently taking the NCHW path would corrupt A/B
            # perf comparisons for users who set the knob on e.g. a U-Net.
            import warnings

            warnings.warn(
                f"loss_layout='nhwc' requested but model "
                f"{self.model_cfg['name']!r} has no native channels-last "
                "output path (supports_output_layout); training uses the "
                "default NCHW loss."
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

    def _loss_nhwc(self, pred_nhwc, tgt_nhwc):
        """The training criterion on channels-last (B, T, H, W, C) tensors:
        identical math to ``LpLoss(d=2, p=2, [0,1,2], [mean,mean,sum])`` —
        the relative-L2 plane norms sum over the same (H, W) elements, just
        addressed at axes (2, 3) instead of a flattened trailing dim."""
        p = pred_nhwc.astype(jnp.float32)
        t = tgt_nhwc.astype(jnp.float32)
        diff_norm = jnp.sqrt(jnp.sum((p - t) ** 2, axis=(2, 3)))
        ynorm = jnp.sqrt(jnp.sum(t * t, axis=(2, 3)))
        return jnp.mean(jnp.sum(diff_norm / ynorm, axis=-1))

    def _use_nhwc_loss(self) -> bool:
        return self.loss_layout == "nhwc" and getattr(
            self.model, "supports_output_layout", False
        )

    # -- batch plumbing ------------------------------------------------------
    def apply(
        self,
        variables,
        batch,
        train: bool,
        rngs=None,
        mutable=False,
        output_layout: str = "nchw",
    ):
        inp = batch[0]
        kw = {}
        if output_layout != "nchw":
            kw["output_layout"] = output_layout
        return self.model.apply(
            variables, inp, train=train, rngs=rngs, mutable=mutable, **kw
        )

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

            use_nhwc = self._use_nhwc_loss()

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
                    output_layout="nhwc" if use_nhwc else "nchw",
                )
                if mutable:
                    pred, updates = out
                    new_bs = updates.get("batch_stats")
                else:
                    pred, new_bs = out, None
                if use_nhwc:
                    # Target relayout happens once, outside the gradient path
                    # (constant w.r.t. params — no backward transpose).
                    tgt = jnp.transpose(self.target(batch), (0, 1, 3, 4, 2))
                    loss = self._loss_nhwc(pred, tgt)
                else:
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

    def apply(
        self,
        variables,
        batch,
        train: bool,
        rngs=None,
        mutable=False,
        output_layout: str = "nchw",
    ):
        inp, _, cond = batch[0], batch[1], batch[2]
        kw = {}
        if output_layout != "nchw":
            kw["output_layout"] = output_layout
        return self.model.apply(
            variables, inp, cond, train=train, rngs=rngs, mutable=mutable, **kw
        )
