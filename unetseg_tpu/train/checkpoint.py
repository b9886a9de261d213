"""Checkpoint / resume via Orbax: a light best-k stream + a full resume stream.

The reference only ever saves weights on a new best validation loss and has
no resume path at all — a mid-run crash loses everything
(reference: scripts/train.py:102,168-173; SURVEY.md §5). Here checkpointing
is split into two streams sized for their consumers:

- **light best-k** (the checkpoint directory root): bf16 params shadow +
  fp32 BatchNorm statistics — everything inference needs, ~6x smaller than
  the full train state (62 MB vs 372 MB for the Adam flagship), so frequent
  new-best saves stay cheap through the slow device->host path.
- **full resume** (`<dir>/full`, latest only): fp32 params + optimizer state
  + step, written on a coarser cadence (TrainConfig.full_save_interval) and
  always at the end, so training can resume exactly.

Legacy single-stream directories (round-1 layout: full state at the root)
remain restorable by both paths.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from unetseg_tpu.core.distributed import is_primary
from unetseg_tpu.train.state import TrainState

FULL_SUBDIR = "full"


def _manager(directory: str, keep: int, best: bool = True) -> ocp.CheckpointManager:
    """best=True keeps the k lowest-val_loss checkpoints (the light
    inference stream); best=False keeps the k LATEST (the full resume
    stream — retention keyed on val loss there silently dropped newer
    resume points whenever validation worsened)."""
    kw = {"create": True}
    if jax.process_count() > 1:
        # Writes are primary-gated (Checkpointer._active), but RESTORE-side
        # managers are built on EVERY process (latest_epoch /
        # restore_checkpoint on resume). Scope each process's Orbax barrier
        # syncs to ITSELF — a singleton set makes Orbax skip every
        # cross-process barrier (a {0}-only set left non-primary processes
        # waiting on barriers process 0 never joins), and a per-process key
        # prefix keeps any residual sync keys from colliding. Orbax refuses
        # create=True with active_processes, so make the root dir here.
        me = jax.process_index()
        kw["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"unetseg_p{me}",
        )
        kw["create"] = False
        os.makedirs(os.path.abspath(directory), exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep,
        best_fn=(lambda m: m["val_loss"]) if best else None,
        best_mode="min",
        **kw,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def _shadow_dtype(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def _host_payload(tree):
    """Synchronous device->host fetch of a save payload.

    Orbax's background serialization reads the arrays *after* `save`
    returns; the train step runs with donate_argnums, so the next step
    deletes those buffers ("Array has been deleted" mid-save), and through
    the remote-TPU tunnel the deferred D2H has also been observed to
    deadlock the async commit thread outright (a lingering
    `N.orbax-checkpoint-tmp` and a stalled loop). Fetching up front hands
    Orbax plain host numpy — the disk write still happens asynchronously,
    but nothing background touches the device."""
    return jax.device_get(tree)


@jax.jit
def _copy_tree(tree):
    return jax.tree.map(jnp.copy, tree)


@jax.jit
def _copy_tree_bf16(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else jnp.copy(a),
        tree,
    )


def _device_copy(tree, float_dtype=None):
    """Fresh device buffers for every leaf (optionally casting floats to
    bf16) in ONE jitted dispatch.

    The copies are what makes a payload safe to hold across later DONATED
    train steps: they are new arrays the optimizer never sees, so donation
    can never delete them."""
    if float_dtype is not None:
        assert float_dtype == jnp.bfloat16
        return _copy_tree_bf16(tree)
    return _copy_tree(tree)


def _ema_payload(state: TrainState, float_dtype=None) -> Optional[Dict[str, Any]]:
    """EMA shadow sub-payload (or None when EMA is off). Stored as a
    SEPARATE Orbax Composite item ("ema") so non-EMA template restores of
    EMA checkpoints — and vice versa — never hit a tree mismatch."""
    if state.ema_params is None:
        return None
    return {
        "params": _device_copy(state.ema_params, float_dtype=float_dtype),
        "batch_stats": _device_copy(state.ema_batch_stats),
    }


def device_light_payload(state: TrainState) -> Dict[str, Any]:
    """Donation-safe DEVICE light payload (bf16 params shadow + BN stats):
    cheap to build (on-device cast/copy), fetched to host later by the
    Checkpointer's background writer. Carries the EMA shadow under "ema"
    when the state tracks one."""
    out = {
        "params": _device_copy(state.params, float_dtype=jnp.bfloat16),
        "batch_stats": _device_copy(state.batch_stats),
    }
    ema = _ema_payload(state, float_dtype=jnp.bfloat16)
    if ema is not None:
        out["ema"] = ema
    return out


def device_full_payload(state: TrainState) -> Dict[str, Any]:
    out = {
        "params": _device_copy(state.params),
        "batch_stats": _device_copy(state.batch_stats),
        "opt_state": _device_copy(state.opt_state),
        "step": np.asarray(state.step),
    }
    ema = _ema_payload(state)
    if ema is not None:
        out["ema"] = ema
    return out


def light_payload(state: TrainState) -> Dict[str, Any]:
    """Host-materialized light payload (bf16 params shadow + BN stats).

    Build this while the state's buffers are still alive: the train step
    donates its input state, so holding a `TrainState` across a later step
    (e.g. a pending-best awaiting its save cooldown) leaves deleted device
    buffers behind — reads then crash or, through the remote tunnel, hang."""
    out = {
        "params": _shadow_dtype(state.params, jnp.bfloat16),
        "batch_stats": state.batch_stats,
    }
    if state.ema_params is not None:
        out["ema"] = {
            "params": _shadow_dtype(state.ema_params, jnp.bfloat16),
            "batch_stats": state.ema_batch_stats,
        }
    return _host_payload(out)


def _full_payload(state: TrainState) -> Dict[str, Any]:
    out = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    if state.ema_params is not None:
        out["ema"] = {
            "params": state.ema_params,
            "batch_stats": state.ema_batch_stats,
        }
    return _host_payload(out)


class Checkpointer:
    """Long-lived manager for asynchronous two-stream checkpointing.

    Saves are enqueued as donation-safe DEVICE copies (device_*_payload)
    and drained by one background writer thread that does the
    device->host fetch and the Orbax write — the train loop keeps stepping
    while the transfer rides the tunnel (a full 372 MB train state costs
    30-47 s fetched synchronously; overlapped it costs ~nothing on the
    critical path). Orbax itself never touches device arrays (its own
    deferred D2H deadlocked against donated buffers through the remote
    tunnel — see _host_payload). `sync=True` restores inline writes."""

    def __init__(self, directory: str, keep: int = 3, sync: bool = False):
        # Multi-host: state is replicated across processes (DP design), so
        # process 0 writes alone and the others no-op — without this gate
        # every pod worker would race on the same checkpoint files
        # (core/distributed.is_primary; exercised by tests/test_multihost.py).
        self._active = is_primary()
        if not self._active:
            self._sync = True
            self._error = None
            return
        self._mgr = _manager(directory, keep)
        self._full = _manager(
            os.path.join(directory, FULL_SUBDIR), keep=1, best=False
        )
        self._sync = sync
        self._error: Optional[BaseException] = None
        if not sync:
            self._q: queue.Queue = queue.Queue()
            self._worker = threading.Thread(
                target=self._drain, name="ckpt-writer", daemon=True
            )
            self._worker.start()

    # ------------------------------------------------------------- writer
    def _write(self, stream: str, payload, epoch, val_loss, extra) -> None:
        payload = dict(jax.device_get(payload))
        ema = payload.pop("ema", None)
        items = {
            "state": ocp.args.StandardSave(payload),
            "extra": ocp.args.JsonSave(extra or {}),
        }
        if ema is not None:
            items["ema"] = ocp.args.StandardSave(ema)
        mgr = self._mgr if stream == "light" else self._full
        mgr.save(
            epoch,
            args=ocp.args.Composite(**items),
            metrics={"val_loss": float(val_loss)},
        )

    def _drain(self) -> None:
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                self._write(*job)
            except BaseException as e:  # surfaced on the next enqueue/close
                self._error = e

    def _submit(self, stream, payload, epoch, val_loss, extra) -> None:
        if not self._active:
            return
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("background checkpoint save failed") from err
        if self._sync:
            self._write(stream, payload, epoch, val_loss, extra)
        else:
            self._q.put((stream, payload, epoch, val_loss, extra))

    # -------------------------------------------------------------- saves
    def save(
        self,
        state: TrainState,
        epoch: int,
        val_loss: float,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Light best-k save (bf16 params + BN stats): the inference artifact."""
        self.save_light_payload(device_light_payload(state), epoch, val_loss, extra)

    def save_light_payload(
        self,
        payload: Dict[str, Any],
        epoch: int,
        val_loss: float,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Save a light payload — either device_light_payload (device
        copies, fetched by the writer thread) or a host-materialized
        light_payload (passes straight through)."""
        self._submit("light", payload, epoch, val_loss, extra)

    def save_full(
        self,
        state: TrainState,
        epoch: int,
        val_loss: float,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Full train-state save (latest only): the resume artifact."""
        self._submit("full", device_full_payload(state), epoch, val_loss, extra)

    def close(self) -> None:
        if not self._active:
            return
        if not self._sync:
            self._q.put(None)
            self._worker.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("background checkpoint save failed") from err
        self._mgr.wait_until_finished()
        self._mgr.close()
        self._full.wait_until_finished()
        self._full.close()


def save_checkpoint(
    directory: str,
    state: TrainState,
    epoch: int,
    val_loss: float,
    keep: int = 3,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """One-shot synchronous save of both streams (tests / scripts)."""
    ck = Checkpointer(directory, keep, sync=True)
    ck.save(state, epoch, val_loss, extra)
    ck.save_full(state, epoch, val_loss, extra)
    ck.close()


def _full_dir(directory: str) -> str:
    return os.path.join(directory, FULL_SUBDIR)


def _stream_latest(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory, keep=100)
    step = mgr.latest_step()
    mgr.close()
    return step


def latest_epoch(directory: str) -> Optional[int]:
    """Latest RESUMABLE epoch: the full stream, falling back to a legacy
    (round-1 single-stream) directory root."""
    full = _stream_latest(_full_dir(directory))
    if full is not None:
        return full
    return _stream_latest(directory)


def light_latest_epoch(directory: str) -> Optional[int]:
    return _stream_latest(directory)


def best_epoch(directory: str) -> Optional[int]:
    """Best epoch of the light best-k stream (val-loss keyed)."""
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory, keep=100)
    step = mgr.best_step()
    mgr.close()
    return step


def _has_ema_item(directory: str, epoch: int) -> bool:
    """Does the checkpoint at <directory>/<epoch> carry the "ema" Composite
    item? Checked on disk so restore logic can distinguish "no shadow was
    saved" (clean fallback/clear error) from a real restore failure
    (corrupt item, wrong template) that must surface loudly."""
    return os.path.isdir(os.path.join(os.path.abspath(directory), str(epoch), "ema"))


def _restore_full_from(
    directory: str, state: TrainState, epoch: int
) -> Tuple[TrainState, Dict[str, Any]]:
    template = _full_payload(state)
    ema_template = template.pop("ema", None)

    def attempt(with_ema: bool):
        items = {
            "state": ocp.args.StandardRestore(template),
            "extra": ocp.args.JsonRestore(),
        }
        if with_ema:
            items["ema"] = ocp.args.StandardRestore(ema_template)
        mgr = _manager(directory, keep=100)
        try:
            return mgr.restore(epoch, args=ocp.args.Composite(**items))
        finally:
            mgr.close()

    # decide by on-disk item presence: a PRESENT-but-broken ema item must
    # fail loudly (a silent raw-weights reseed would discard the shadow a
    # wedged save left behind), while a genuinely pre-EMA checkpoint falls
    # back cleanly and reseeds below
    want_ema = ema_template is not None and _has_ema_item(directory, epoch)
    restored = attempt(want_ema)
    st = restored["state"]
    state = state.replace(
        params=st["params"],
        batch_stats=st["batch_stats"],
        opt_state=st["opt_state"],
        step=int(np.asarray(st["step"])),
    )
    if ema_template is not None:
        ema = restored.get("ema") if want_ema and "ema" in restored else None
        if ema is not None:
            state = state.replace(
                ema_params=ema["params"], ema_batch_stats=ema["batch_stats"]
            )
        else:
            # resuming EMA training from a non-EMA checkpoint: restart the
            # shadow at the restored weights (debias keeps it tracking)
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, st["params"]),
                ema_batch_stats=jax.tree.map(jnp.copy, st["batch_stats"]),
            )
    return state, restored.get("extra") or {}


def restore_checkpoint(
    directory: str,
    state: TrainState,
    epoch: Optional[int] = None,
) -> Tuple[TrainState, int, Dict[str, Any]]:
    """Restore the full train state into a template `state` (resume path).
    Reads `<dir>/full`, falling back to a legacy full-state root. Returns
    (state, epoch_restored, extra)."""
    full_dir = _full_dir(directory)
    full_epoch = _stream_latest(full_dir)
    if full_epoch is not None:
        # A full stream exists: restore from it and surface ITS errors.
        # Falling through to the legacy path here would re-try against the
        # LIGHT stream at the root (bf16 params only) and fail with a
        # confusing tree mismatch that masks the real cause (e.g. an
        # optimizer-state template change).
        e = epoch if epoch is not None else full_epoch
        state, extra = _restore_full_from(full_dir, state, e)
        return state, int(e), extra
    # Legacy single-stream root (pre-two-stream checkpoints).
    e = epoch if epoch is not None else _stream_latest(directory)
    if e is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    state, extra = _restore_full_from(directory, state, e)
    return state, int(e), extra


def restore_light(
    directory: str,
    params_template: Dict[str, Any],
    batch_stats_template: Dict[str, Any],
    epoch: Optional[int] = None,
    ema: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Restore (params fp32, batch_stats, extra) from the light stream.
    ema=True loads the EMA shadow ("ema" item) instead of the raw weights;
    checkpoints written without EMA fail with a clear error."""
    mgr = _manager(directory, keep=100)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints under {directory}")
    template = {
        "params": _shadow_dtype(params_template, jnp.bfloat16),
        "batch_stats": batch_stats_template,
    }
    if ema and not _has_ema_item(directory, epoch):
        mgr.close()
        raise FileNotFoundError(
            f"checkpoint {directory} (epoch {epoch}) has no EMA shadow "
            f"— was it trained with TrainConfig.ema_decay > 0?"
        )
    item = "ema" if ema else "state"
    try:
        restored = mgr.restore(
            epoch,
            args=ocp.args.Composite(**{
                item: ocp.args.StandardRestore(template),
                "extra": ocp.args.JsonRestore(),
            }),
        )
    finally:
        mgr.close()
    st = restored[item]
    params = _shadow_dtype(st["params"], jnp.float32)
    return params, st["batch_stats"], restored.get("extra") or {}


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
    ema: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, batch_stats) of the best (default) or given epoch — the
    consumer-side equivalent of the reference's torch.load into eval scripts
    (reference: scripts/predict.py:123, scripts/inference.py:47).

    Tries the light best-k stream first (no optimizer state involved at
    all); falls back to a legacy full-state root, where the optimizer state
    template must structurally match the checkpoint (SGD momentum vs Adam
    moments differ), so the saved config is read and the template's
    optimizer rebuilt from it. ema=True loads the EMA shadow; a missing
    shadow is a hard error (never a silent raw-weights fallback)."""
    if epoch is None and prefer_best:
        epoch = best_epoch(directory)
    try:
        params, batch_stats, _ = restore_light(
            directory, state.params, state.batch_stats, epoch, ema=ema
        )
        return params, batch_stats
    except FileNotFoundError:
        if ema:
            # the requested epoch may live only in the FULL resume stream
            # (full_save_interval cadence) — which also carries the "ema"
            # item. Only a target that genuinely lacks the shadow is a
            # hard error; a present-but-broken item surfaces from the
            # restore itself.
            full_dir = _full_dir(directory)
            full_epoch = epoch if epoch is not None else _stream_latest(full_dir)
            if full_epoch is None or not _has_ema_item(full_dir, full_epoch):
                raise
        pass  # full/legacy full-state stream below
    except Exception:
        if ema:
            raise
        pass  # legacy full-state root below
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
    # restore_checkpoint resolves the full stream (<dir>/full) first and
    # falls back to a legacy single-stream root — for an explicit epoch too:
    # a full-save-only epoch (full_save_interval cadence) exists only there,
    # not in the light best-k root.
    if ema:
        # an ema-structured template so the "ema" item restores alongside
        # (presence was verified above — no silent reseed can reach here)
        state = state.replace(
            ema_params=state.params, ema_batch_stats=state.batch_stats
        )
    st, _, _ = restore_checkpoint(directory, state, epoch)
    if ema:
        return st.ema_params, st.ema_batch_stats
    return st.params, st.batch_stats
