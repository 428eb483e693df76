"""Orbax checkpointing: train state + normalization constants.

Replaces Lightning's ``.ckpt`` files (the reference saves state_dict,
optimizer state and hyper-parameters including the normalization constants
via ``save_hyperparameters()`` at ``modules.py:57``, consumed at inference
through ``hyper_parameters['normalization_constants']``).  Here everything
the restore path needs travels in one pytree; saves are asynchronous so the
train loop never blocks on IO.

Preemption-numbered checkpoint paths (``hpc_ckpt_N``) mirror
``scripts/train.py:91-96``.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


def _as_pytree(state, norm_constants: Optional[Tuple[Dict, Dict]]):
    tree = {"state": state}
    if norm_constants is not None:
        tree["norm_diff"] = dict(norm_constants[0])
        tree["norm_div"] = dict(norm_constants[1])
    return tree


class CheckpointManager:
    """Thin wrapper over an (optionally async) Orbax StandardCheckpointer."""

    def __init__(self, use_async: bool = True):
        if use_async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())

    def save(
        self,
        path: str,
        state,
        norm_constants: Optional[Tuple[Dict, Dict]] = None,
        force: bool = True,
    ) -> None:
        self._ckptr.save(
            os.path.abspath(path), _as_pytree(state, norm_constants), force=force
        )

    def restore(
        self,
        path: str,
        target_state,
        norm_example: Optional[Tuple[Dict, Dict]] = None,
    ):
        """Restore into the structure (shapes/dtypes/shardings) of the target.

        ``norm_example`` must mirror the norm-constant dicts the checkpoint
        was saved with (the values are ignored).  Returns
        ``(state, norm_constants_or_None)``.
        """
        target = _as_pytree(target_state, norm_example)
        restored = self._ckptr.restore(os.path.abspath(path), target)
        norm = (
            (restored["norm_diff"], restored["norm_div"])
            if norm_example is not None
            else None
        )
        return restored["state"], norm

    def restore_params(
        self,
        path: str,
        target_params,
        norm_example: Optional[Tuple[Dict, Dict]] = None,
    ):
        """Partial restore: parameters (+ norm constants) only.

        Inference does not need the optimizer state, and must not depend on
        which optimizer a checkpoint was trained with — restore just the
        ``state.params`` subtree (and the normalization constants if asked).
        Returns ``(params, norm_constants_or_None)``.
        """
        target = {"state": {"params": target_params}}
        if norm_example is not None:
            target["norm_diff"] = dict(norm_example[0])
            target["norm_div"] = dict(norm_example[1])
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            restored = ckptr.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(
                    item=target, restore_args=restore_args, partial_restore=True
                ),
            )
        norm = (
            (restored["norm_diff"], restored["norm_div"])
            if norm_example is not None
            else None
        )
        return restored["state"]["params"], norm

    def wait(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def next_preempt_ckpt_path(log_dir: str, resume_path: Optional[str]) -> str:
    """Numbered preemption-checkpoint path, mirroring ``train.py:91-96``."""
    if resume_path is None:
        return os.path.join(log_dir, "hpc_ckpt_1")
    m = re.search(r"hpc_ckpt_(\d+)", os.path.basename(resume_path))
    n = int(m.group(1)) + 1 if m else 1
    return os.path.join(log_dir, f"hpc_ckpt_{n}")
