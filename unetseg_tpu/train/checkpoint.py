"""Checkpoint / resume via Orbax.

The reference only ever saves weights on a new best validation loss and has
no resume path at all — a mid-run crash loses everything
(reference: scripts/train.py:102,168-173; SURVEY.md §5). Here the full train
state (params, BN stats, SGD momentum, step) plus the data-order RNG seed is
checkpointed with best-k retention keyed on validation loss, and training can
resume exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from unetseg_tpu.train.state import TrainState


def _manager(directory: str, keep: int) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep,
        best_fn=lambda m: m["val_loss"],
        best_mode="min",
        create=True,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class Checkpointer:
    """Long-lived manager for asynchronous best-k checkpointing.

    Orbax saves run in the background; the train loop keeps stepping while
    the previous checkpoint drains (device-to-host transfer of the 372 MB
    train state costs ~15 s through the remote-TPU tunnel — synchronous
    saves would dominate epochs that improve every time)."""

    def __init__(self, directory: str, keep: int = 3):
        self._mgr = _manager(directory, keep)

    def save(
        self,
        state: TrainState,
        epoch: int,
        val_loss: float,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                extra=ocp.args.JsonSave(extra or {}),
            ),
            metrics={"val_loss": float(val_loss)},
        )

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_checkpoint(
    directory: str,
    state: TrainState,
    epoch: int,
    val_loss: float,
    keep: int = 3,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """One-shot synchronous save (tests / scripts)."""
    ck = Checkpointer(directory, keep)
    ck.save(state, epoch, val_loss, extra)
    ck.close()


def latest_epoch(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory, keep=100)
    step = mgr.latest_step()
    mgr.close()
    return step


def best_epoch(directory: str) -> Optional[int]:
    mgr = _manager(directory, keep=100)
    step = mgr.best_step()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str,
    state: TrainState,
    epoch: Optional[int] = None,
) -> Tuple[TrainState, int, Dict[str, Any]]:
    """Restore into a template `state` (from create_train_state). Returns
    (state, epoch_restored, extra)."""
    mgr = _manager(directory, keep=100)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    restored = mgr.restore(
        epoch,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template),
            extra=ocp.args.JsonRestore(),
        ),
    )
    mgr.close()
    st = restored["state"]
    state = state.replace(
        params=st["params"],
        batch_stats=st["batch_stats"],
        opt_state=st["opt_state"],
        step=int(np.asarray(st["step"])),
    )
    return state, int(epoch), restored.get("extra") or {}


def read_checkpoint_config(
    directory: str, epoch: Optional[int] = None
) -> Dict[str, Any]:
    """The Config dict stored alongside a checkpoint (empty if absent)."""
    mgr = _manager(directory, keep=100)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints under {directory}")
    restored = mgr.restore(
        epoch, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
    )
    mgr.close()
    return (restored.get("extra") or {}).get("config", {})


def restore_params_for_inference(
    directory: str,
    state: TrainState,
    epoch: Optional[int] = None,
    prefer_best: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, batch_stats) of the best (default) or given epoch — the
    consumer-side equivalent of the reference's torch.load into eval scripts
    (reference: scripts/predict.py:123, scripts/inference.py:47).

    The optimizer state template must match what the checkpoint holds (SGD
    momentum vs Adam moments differ structurally); the saved config is read
    first and the template's optimizer rebuilt from it."""
    if epoch is None and prefer_best:
        epoch = best_epoch(directory)
    try:
        saved = read_checkpoint_config(directory, epoch)
        train_section = saved.get("train")
        if train_section:
            from unetseg_tpu.core.config import TrainConfig

            known = {f.name for f in __import__("dataclasses").fields(TrainConfig)}
            t_cfg = TrainConfig(
                **{k: v for k, v in train_section.items() if k in known}
            )
            from unetseg_tpu.train.state import make_optimizer

            # steps_per_epoch only shapes the schedule's VALUES; the state
            # STRUCTURE (ScaleByScheduleState vs ScaleState) depends on
            # whether a schedule exists at all, so any positive int works.
            spe = 1 if t_cfg.cosine_decay else None
            tx = make_optimizer(t_cfg, steps_per_epoch=spe)
            state = state.replace(tx=tx, opt_state=tx.init(state.params))
    except Exception:
        pass  # fall back to the caller's template
    st, _, _ = restore_checkpoint(directory, state, epoch)
    return st.params, st.batch_stats
