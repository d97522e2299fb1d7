"""Orbax checkpointing: save/restore train state and inference params.

Replaces Lightning ModelCheckpoint + the three-format torch loader
(main/utils_train.py:35-160, scripts/evaluation/inference.py:34-59):
  * step-interval checkpoints with retention (every_n_train_steps semantics)
  * weights-only export for inference
  * resume = restore latest (reference --auto_resume, main/trainer.py:27-28)
  * on-demand "summoning" checkpoints (reference SIGUSR1, trainer.py:129-143)
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 save_interval_steps: int = 1,
                 monitor: Optional[str] = None, top_k: int = 3,
                 mode: str = "min"):
        """monitor: metric name for best-k retention — the reference's
        monitored ModelCheckpoint (main/utils_train.py:68-73: when
        model.params.monitor is set, save_top_k=3, mode='min'). When set,
        only the `top_k` checkpoints with the best `metrics[monitor]` are
        kept and save() should be given the current metrics dict."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        opts = dict(max_to_keep=max_to_keep,
                    save_interval_steps=save_interval_steps, create=True)
        if monitor is not None:
            assert mode in ("min", "max"), mode
            opts.update(best_fn=lambda m: m[monitor], best_mode=mode,
                        max_to_keep=top_k)
        self._mngr = ocp.CheckpointManager(
            directory, options=ocp.CheckpointManagerOptions(**opts))

    def save(self, step: int, state: Any, force: bool = False,
             metrics: Optional[dict] = None) -> bool:
        if self.monitor is not None:
            metrics = dict(metrics or {})
            if self.monitor not in metrics:
                # no measurement yet (e.g. checkpoint before the first val
                # pass) -> rank worst rather than fail the save
                metrics[self.monitor] = float("inf") if self.mode == "min" \
                    else float("-inf")
            metrics = {k: float(v) for k, v in metrics.items()}
        saved = self._mngr.save(
            step, args=ocp.args.StandardSave(state), force=force,
            metrics=metrics)
        return bool(saved)

    def all_steps(self):
        return sorted(self._mngr.all_steps())

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()


def save_params(path: str, params: Any) -> None:
    """Weights-only export (inference checkpoints)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


def swap_in_ema(state) -> Any:
    """Return params with EMA shadow weights swapped in for eval
    (reference ema_scope, lvdm/models/ddpm3d.py:188-201)."""
    return state.ema_params if state.ema_params is not None else state.params
