"""The training driver: epochs, validation, best-checkpointing, resume.

Functional equivalent of the reference's __main__ loop
(reference: scripts/train.py:64-175): 90/10 split, weighted-CE train epochs,
unweighted-CE validation, checkpoint on new best validation loss — plus the
things the reference lacks (SURVEY.md §5): resume, structured metrics,
deterministic data order keyed by (seed, epoch), and an optional device mesh
for batch-axis data parallelism.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import numpy as np

from unetseg_tpu.core.config import Config
from unetseg_tpu.core.distributed import host_put, host_put_tree
from unetseg_tpu.core.mesh import MeshSpec
from unetseg_tpu.data.dataset import (
    HeLaArrays,
    epoch_index_matrix,
    iter_batches,
    num_batches,
    train_val_split,
)
from unetseg_tpu.models.unet import UNet
from unetseg_tpu.train import checkpoint as ckpt
from unetseg_tpu.train.metrics_log import MetricsLogger, StepTimer
from unetseg_tpu.train.state import TrainState, create_train_state
from unetseg_tpu.train.steps import make_eval_step, make_train_step


@dataclass
class TrainResult:
    state: TrainState
    best_val_loss: float
    best_epoch: int
    history: List[Dict[str, float]]


def lanes_active(
    mode: str,
    m_cfg,
    input_size: int,
    mesh: Optional[MeshSpec],
    batch_size: Optional[int] = None,
) -> bool:
    """Resolve TrainConfig.lanes ("auto"|"on"|"off") for this run.

    Auto requires a real TPU backend (the Pallas kernels are Mosaic-only)
    and a geometry the lanes layout supports. Under a device mesh the lanes
    kernels run inside shard_map over the data axis
    (parallel/sharding.make_lanes_dp_train_step), whose in_specs split the
    batch dim evenly — so the batch must divide by the data-parallel degree
    (GSPMD tolerates uneven shards; shard_map does not)."""
    from unetseg_tpu.infer.lanes_net import supports

    if mode == "off":
        return False
    ok = supports(m_cfg, input_size)
    divisible = (
        mesh is None
        or batch_size is None
        or batch_size % mesh.num_data == 0
    )
    if mode == "on":
        if not ok:
            raise ValueError(
                f"TrainConfig.lanes='on' but the lanes path does not support "
                f"this geometry (input_size={input_size}, levels="
                f"{m_cfg.levels}, base_features={m_cfg.base_features})"
            )
        if not divisible:
            raise ValueError(
                f"TrainConfig.lanes='on' under a mesh needs batch_size "
                f"({batch_size}) divisible by the data-parallel degree "
                f"({mesh.num_data}); shard_map splits the batch evenly"
            )
        return True
    if mode != "auto":
        raise ValueError(f"TrainConfig.lanes must be auto|on|off, got {mode!r}")
    return ok and divisible and jax.default_backend() == "tpu"


def _put_batch(batch, spec: Optional[MeshSpec]):
    arrays = (batch.images, batch.masks, batch.weight_maps, batch.valid)
    if spec is None:
        return arrays
    sh = spec.batch_sharding()
    # host_put == device_put single-process; multi-host it materializes only
    # this process's addressable shards (per-process feed)
    return tuple(host_put(a, sh) for a in arrays)


def train(
    cfg: Config,
    data: Optional[HeLaArrays] = None,
    mesh: Optional[MeshSpec] = None,
    logger: Optional[MetricsLogger] = None,
    max_steps: Optional[int] = None,
) -> TrainResult:
    t_cfg, d_cfg, m_cfg = cfg.train, cfg.data, cfg.model
    # multi-host: only process 0 writes the metrics JSONL (same gate as
    # checkpoints — every process would otherwise append to one file)
    from unetseg_tpu.core.distributed import is_primary

    logger = logger or MetricsLogger(
        t_cfg.metrics_jsonl if is_primary() else None
    )

    data = data or HeLaArrays.load(d_cfg)
    n = len(data)
    train_idx, val_idx = train_val_split(n, d_cfg.val_percent, t_cfg.seed)
    logger.log(
        {"event": "start", "n_train": len(train_idx), "n_val": len(val_idx)},
    )

    model = UNet(cfg=m_cfg)
    rng = jax.random.key(t_cfg.seed)
    rng, init_rng = jax.random.split(rng)
    input_size = data.images.shape[1]
    state = create_train_state(
        init_rng, model_cfg=m_cfg, train_cfg=t_cfg,
        input_size=input_size, model=model,
        steps_per_epoch=num_batches(len(train_idx), t_cfg.batch_size),
    )

    start_epoch = 0
    if t_cfg.resume:
        latest = ckpt.latest_epoch(t_cfg.checkpoint_dir)
        if latest is not None:
            state, start_epoch, _ = ckpt.restore_checkpoint(
                t_cfg.checkpoint_dir, state, latest
            )
            start_epoch += 1
            logger.log({"event": "resume", "epoch": start_epoch})

    if mesh is not None:
        # identical seeds build identical state on every process, so
        # replication across a multi-host mesh is a pure placement
        state = host_put_tree(state, mesh.replicated())

    three_class = m_cfg.num_classes == 3
    lanes = lanes_active(
        t_cfg.lanes, m_cfg, input_size, mesh, batch_size=t_cfg.batch_size
    )
    # the feed pads only the last batch; when the split divides evenly every
    # batch item is real, so BN item-masking (and its backward select_n over
    # every activation) can be dropped statically from the step
    assume_valid = len(train_idx) % t_cfg.batch_size == 0
    if lanes:
        logger.log({"event": "lanes_train", "input_size": input_size})
    if lanes and mesh is not None:
        from unetseg_tpu.parallel.sharding import make_lanes_dp_train_step

        train_step = make_lanes_dp_train_step(
            mesh,
            m_cfg,
            assume_valid=assume_valid,
            augment=d_cfg.augment,
            elastic_alpha=d_cfg.elastic_alpha,
            elastic_sigma=d_cfg.elastic_sigma,
            donate=t_cfg.donate_state,
            three_class=three_class,
            border_boost=t_cfg.border_boost,
            standardize=d_cfg.standardize,
            aug_gamma=d_cfg.aug_gamma,
            aug_illum=d_cfg.aug_illum,
            aug_noise=d_cfg.aug_noise,
        )
    else:
        train_step = make_train_step(
            model,
            assume_valid=assume_valid,
            augment=d_cfg.augment,
            elastic_alpha=d_cfg.elastic_alpha,
            elastic_sigma=d_cfg.elastic_sigma,
            donate=t_cfg.donate_state,
            three_class=three_class,
            border_boost=t_cfg.border_boost,
            standardize=d_cfg.standardize,
            aug_gamma=d_cfg.aug_gamma,
            aug_illum=d_cfg.aug_illum,
            aug_noise=d_cfg.aug_noise,
            # remat slows the lanes step (52.4 vs 46.2 ms no-aug): the
            # custom-VJP kernels already recompute nothing worth discarding
            remat=None if lanes else t_cfg.remat,
            lanes=lanes,
        )
    # Device-resident feed: scan the step over the epoch (ONE dispatch per
    # epoch; see TrainConfig.device_data). Under a GSPMD mesh the dataset
    # lives replicated and the gathered batches carry data-axis sharding
    # constraints; the shard_map lanes step scans via its own factory
    # (GSPMD cannot partition pallas_call). The host-fed path remains for
    # per-step profiling and max_steps debugging.
    use_scan = (
        t_cfg.device_data
        and t_cfg.profile_dir is None
        and max_steps is None
    )
    if use_scan:
        aug_kw = dict(
            assume_valid=assume_valid,
            augment=d_cfg.augment,
            elastic_alpha=d_cfg.elastic_alpha,
            elastic_sigma=d_cfg.elastic_sigma,
            donate=t_cfg.donate_state,
            three_class=three_class,
            border_boost=t_cfg.border_boost,
            standardize=d_cfg.standardize,
            aug_gamma=d_cfg.aug_gamma,
            aug_illum=d_cfg.aug_illum,
            aug_noise=d_cfg.aug_noise,
        )
        if lanes and mesh is not None:
            from unetseg_tpu.parallel.sharding import make_lanes_dp_epoch_step

            epoch_step = make_lanes_dp_epoch_step(mesh, m_cfg, **aug_kw)
        else:
            from unetseg_tpu.train.steps import make_epoch_train_step

            epoch_step = make_epoch_train_step(
                model,
                mesh=mesh,
                remat=None if lanes else t_cfg.remat,
                lanes=lanes,
                **aug_kw,
            )
        if mesh is not None:
            repl = mesh.replicated()
            dev_images = host_put(data.images, repl)
            dev_masks = host_put(data.masks, repl)
            dev_wmaps = host_put(data.weight_maps, repl)
        else:
            dev_images = jax.device_put(data.images)
            dev_masks = jax.device_put(data.masks)
            dev_wmaps = jax.device_put(data.weight_maps)
        data_rng = jax.random.key(t_cfg.seed + 1)
        logger.log({"event": "device_data", "bytes": int(
            data.images.nbytes + data.masks.nbytes + data.weight_maps.nbytes
        )})
        from unetseg_tpu.train.steps import make_epoch_eval_step

        epoch_eval = make_epoch_eval_step(
            model, mesh=mesh,
            three_class=three_class, standardize=d_cfg.standardize,
        )
        # the val schedule never changes: build its index matrix once
        val_mat, val_valid = epoch_index_matrix(
            val_idx, t_cfg.batch_size, shuffle=False, seed=0
        )
    eval_step = make_eval_step(
        model, three_class=three_class, standardize=d_cfg.standardize
    )

    from unetseg_tpu.models.shapes import output_size

    out = output_size(input_size)
    timer = StepTimer(pixels_per_step=t_cfg.batch_size * out * out)

    best_val = float("inf")
    best_epoch = -1
    history: List[Dict[str, float]] = []
    global_step = 0
    done = False
    checkpointer = (
        ckpt.Checkpointer(
            t_cfg.checkpoint_dir, keep=t_cfg.keep_best_k,
            sync=not t_cfg.async_save,
        )
        if t_cfg.save_checkpoint
        else None
    )
    last_saved_epoch = -(10**9)
    last_full_epoch = -(10**9)
    pending_best = None  # (state, epoch, val_loss) awaiting the cooldown

    for epoch in range(start_epoch, t_cfg.num_epochs):
        # ------------------------------------------------------------ train
        # Losses stay on device until a log point: fetching a scalar every
        # step would serialize the pipeline on host round-trips (the remote
        # TPU tunnel costs ~27 ms per fetch; even locally it stalls dispatch).
        pending_losses = []
        n_steps = 0
        timer.reset()
        if use_scan:
            mat, vmat = epoch_index_matrix(
                train_idx, t_cfg.batch_size, shuffle=True,
                seed=t_cfg.seed * 100003 + epoch,
            )
            ekey = jax.random.fold_in(data_rng, epoch)
            state, ms = epoch_step(
                state, dev_images, dev_masks, dev_wmaps, mat, vmat,
                ekey,
            )
            # the one sync point of the epoch (a value fetch — the remote
            # tunnel does not honor block_until_ready)
            losses = np.asarray(jax.device_get(ms["loss"]))
            n_steps = int(mat.shape[0])
            global_step += n_steps
            timer.tick(n_steps)
            epoch_loss = float(losses.sum())
            if n_steps:
                logger.log(
                    {
                        "event": "train_step",
                        "epoch": epoch,
                        "step": global_step,
                        "loss": float(losses[-1]),
                        **timer.rates(),
                    },
                )
            epoch_iter = ()
        else:
            epoch_iter = iter_batches(
                data, train_idx, t_cfg.batch_size, shuffle=True,
                seed=t_cfg.seed * 100003 + epoch,
            )
        for batch in epoch_iter:
            rng, step_key = jax.random.split(rng)
            images, masks, weights, valid = _put_batch(batch, mesh)
            if t_cfg.profile_dir and global_step == 1:
                jax.profiler.start_trace(t_cfg.profile_dir)
            state, metrics = train_step(
                state, images, masks, weights, valid, step_key
            )
            if (
                t_cfg.profile_dir
                and global_step == 1 + t_cfg.profile_steps
            ):
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                logger.log({"event": "profile_written", "dir": t_cfg.profile_dir})
            pending_losses.append(metrics["loss"])
            n_steps += 1
            global_step += 1
            timer.tick()
            if global_step % t_cfg.log_every == 0:
                logger.log(
                    {
                        "event": "train_step",
                        "epoch": epoch,
                        "step": global_step,
                        "loss": float(pending_losses[-1]),
                        **timer.rates(),
                    },
                    echo=(global_step % (t_cfg.log_every * 10) == 0),
                )
            if max_steps is not None and global_step >= max_steps:
                done = True
                break

        if not use_scan:
            # one stacked transfer instead of n_steps scalar fetches
            epoch_loss = float(
                np.sum(np.asarray(jax.device_get(pending_losses)))
            )
        avg_train = epoch_loss / max(n_steps, 1)

        # -------------------------------------------------------------- val
        val_metrics: Dict[str, float] = {}
        if len(val_idx) > 0:
            if use_scan:
                # one scanned device program + one stacked fetch
                ms_val = jax.device_get(
                    epoch_eval(state, dev_images, dev_masks, val_mat, val_valid)
                )
                val_metrics = {
                    k: float(np.mean(v)) for k, v in ms_val.items()
                }
            else:
                # metrics stay on device until one stacked fetch at the end
                per_batch = []
                for batch in iter_batches(
                    data, val_idx, t_cfg.batch_size, shuffle=False, seed=0
                ):
                    images, masks, _, valid = _put_batch(batch, mesh)
                    per_batch.append(eval_step(state, images, masks, valid))
                fetched = jax.device_get(per_batch)
                val_metrics = {
                    k: float(np.mean([d[k] for d in fetched])) for k in fetched[0]
                }

        record = {
            "event": "epoch",
            "epoch": epoch,
            "train_loss": avg_train,
            **val_metrics,
            **timer.rates(),
        }
        logger.log(record)
        history.append({k: v for k, v in record.items() if isinstance(v, float)})

        # ------------------------------------------------------- checkpoint
        val_loss = val_metrics.get("val_loss", avg_train)
        if val_loss < best_val:
            best_val = val_loss
            best_epoch = epoch
            # Hold the best state until the save cooldown allows a write, so
            # a best inside the cooldown window is never silently dropped.
            # Device COPIES taken NOW: the next step donates (deletes) this
            # state's own buffers (see checkpoint.device_light_payload).
            pending_best = (
                ckpt.device_light_payload(state)
                if t_cfg.save_checkpoint
                else None,
                epoch,
                val_loss,
            )
        if pending_best is not None and checkpointer is not None:
            due = (
                epoch - last_saved_epoch >= t_cfg.checkpoint_min_interval
                or epoch == t_cfg.num_epochs - 1
                or done
            )
            if due:
                b_payload, b_epoch, b_loss = pending_best
                checkpointer.save_light_payload(
                    b_payload, b_epoch, b_loss, extra={"config": cfg.to_dict()}
                )
                last_saved_epoch = epoch
                pending_best = None
                logger.log(
                    {"event": "checkpoint", "epoch": b_epoch, "val_loss": b_loss}
                )
        # full (resumable) save on its own coarser cadence; the CURRENT
        # state, not the best — resume continues from where training stopped
        if checkpointer is not None and (
            epoch - last_full_epoch >= t_cfg.full_save_interval
            or epoch == t_cfg.num_epochs - 1
            or done
        ):
            checkpointer.save_full(
                state, epoch, val_loss, extra={"config": cfg.to_dict()}
            )
            last_full_epoch = epoch
            logger.log({"event": "checkpoint_full", "epoch": epoch})
        if done:
            break

    if checkpointer is not None:
        checkpointer.close()
    return TrainResult(
        state=state, best_val_loss=best_val, best_epoch=best_epoch, history=history
    )
