"""Checkpoint/resume via Orbax.

Reference semantics replicated (SURVEY.md §5.4): a rolling checkpoint of
``{step, params, batch_stats, opt_state}`` with ``max_to_keep`` retention
(`FCOS/train_fcos.py:289-294`), saved on a step cadence together with the
loss-history CSV; `restore_latest` resumes both so step counting and logs
continue seamlessly (`train_fcos.py:296-310`). Saves are async
(preemption-friendly) and work under multi-host pjit.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False):
        self._mgr.save(
            int(step), args=ocp.args.StandardSave(state), force=force
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> tuple[Any, int] | None:
        """Restore the newest checkpoint into the template's structure.

        Returns (state, step) or None when no checkpoint exists.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template
        )
        state = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return state, step

    def restore_params(
        self, template: Any, use_ema: bool = False
    ) -> tuple[Any, int] | None:
        """Restore only ``params``/``batch_stats`` (+step) into the template.

        For inference: ignores optimizer state entirely, so checkpoints are
        loadable regardless of which optimizer trained them (SGD vs Adam
        opt_state pytrees differ). With ``use_ema=True``, loads the
        EMA-averaged weights (``ema_params``, trainers' --ema_decay) as the
        inference params.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        # raw restore (no template): returns the checkpoint as saved, with
        # whatever opt_state pytree the trainer used; we keep only params +
        # batch_stats.
        restored = self._mgr.restore(step)
        params = restored["params"]
        if use_ema:
            ema = restored.get("ema_params")
            if ema is None:
                raise ValueError(
                    "checkpoint has no ema_params — train with --ema_decay"
                )
            params = ema
        state = template.replace(
            params=params, batch_stats=restored["batch_stats"]
        )
        return state, step

    def close(self):
        self._mgr.close()
