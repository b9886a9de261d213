"""Explicitly sharded training/inference over the device mesh.

The reference has zero distributed code (SURVEY.md §2 'Parallelism
inventory'); this is the TPU-native replacement. The strategy, per the
scaling-book recipe: pick a mesh, annotate shardings on the arguments, let
XLA/GSPMD insert the collectives (psum for gradient reduction over ICI,
all-gathers for tile results), and keep parameters replicated — at 31M fp32
params, weights are tiny next to 512^2 activations, so data/tile parallelism
is the right axis split and the 'model' axis stays size 1 but plumbed
(addable without API changes).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from unetseg_tpu.core.mesh import MeshSpec
from unetseg_tpu.models.unet import UNet
from unetseg_tpu.train.state import TrainState
from unetseg_tpu.train.steps import make_eval_step, make_train_step


def make_sharded_train_step(
    mesh: MeshSpec,
    model: UNet,
    augment: bool = True,
    elastic_alpha: float = 2000.0,
    elastic_sigma: float = 20.0,
    donate: bool = True,
) -> Callable:
    """Train step jitted with explicit shardings: state replicated, batch
    arrays sharded over the data axis, outputs replicated. Gradients are
    averaged across the batch, so GSPMD emits one psum over ICI per step —
    functionally identical to the single-device step."""

    def step(state, images, masks, weights, valid, key):
        base = make_train_step(
            model, augment=augment, elastic_alpha=elastic_alpha,
            elastic_sigma=elastic_sigma, donate=False,
        )
        # the inner step is already jit; calling it inside jit inlines it
        return base(state, images, masks, weights, valid, key)

    repl = NamedSharding(mesh.mesh, P())
    batch_sh = NamedSharding(mesh.mesh, P(mesh.data_axis))
    in_sh = (repl, batch_sh, batch_sh, batch_sh, batch_sh, repl)
    out_sh = (repl, repl)
    return jax.jit(
        step,
        in_shardings=in_sh,
        out_shardings=out_sh,
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_eval_step(mesh: MeshSpec, model: UNet) -> Callable:
    def step(state, images, masks, valid):
        return make_eval_step(model)(state, images, masks, valid)

    repl = NamedSharding(mesh.mesh, P())
    batch_sh = NamedSharding(mesh.mesh, P(mesh.data_axis))
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, batch_sh, batch_sh),
        out_shardings=repl,
    )


def make_sharded_tile_forward(
    mesh: MeshSpec,
    model: UNet,
    variables,
    normalize_mean: float = 0.5,
    normalize_std: float = 0.5,
    normalize: bool = True,
) -> Callable:
    """Tile-batch forward with the leading (tile) axis sharded over
    (data, tile) — the engine passes this to tiled_apply. Each device runs
    its tiles; stitching gathers over ICI."""
    from unetseg_tpu.ops.losses import binary_probs_from_logits

    repl = NamedSharding(mesh.mesh, P())
    tile_sh = NamedSharding(mesh.mesh, P((mesh.data_axis, mesh.tile_axis)))

    def fwd(tiles):
        x = tiles
        if normalize:
            x = (x - normalize_mean) / normalize_std
        logits = model.apply(variables, x[..., None], train=False)
        return binary_probs_from_logits(logits)[..., None]

    return jax.jit(fwd, in_shardings=(tile_sh,), out_shardings=tile_sh)


def make_lanes_dp_train_step(
    mesh: MeshSpec,
    model_cfg,
    augment: bool = True,
    elastic_alpha: float = 2000.0,
    elastic_sigma: float = 20.0,
    donate: bool = True,
    three_class: bool = False,
    border_boost: float = 1.0,
    standardize: bool = False,
    aug_gamma: float = 0.0,
    aug_illum: float = 0.0,
    aug_noise: float = 0.0,
    interpret: bool = False,
    jit: bool = True,
    assume_valid: bool = False,
) -> Callable:
    """Data-parallel train step for the lanes-native forward
    (models/lanes_train.py) via `jax.shard_map` over the mesh's data axis.

    GSPMD cannot partition `pallas_call`, so the Pallas custom-VJP conv
    kernels run *inside* shard_map — each device executes the full lanes
    forward/backward on its batch shard; the step stays numerically
    identical to the single-device step because

    - augmentation runs OUTSIDE shard_map under plain GSPMD (elementwise /
      gather ops partition fine), so the key->field mapping per batch item
      is unchanged;
    - batch-norm moment sums are psummed across the axis inside the forward
      (train_forward_lanes(axis_name=...)), giving global batch statistics;
    - the loss normalizer is the GLOBAL valid-pixel count (computed before
      shard_map), so psumming per-shard losses and gradients reproduces the
      global mean exactly.

    Parity vs the single-device lanes step is pinned by
    tests/test_lanes_dp.py on the 8-virtual-device CPU mesh
    (interpret-mode kernels). reference: scripts/train.py:104-138 is the
    single-GPU ancestor; this is its ICI-collective replacement.
    """
    from unetseg_tpu.models.lanes_train import train_forward_lanes
    from unetseg_tpu.models.shapes import output_size
    from unetseg_tpu.train.steps import (
        _masked_mean_loss,
        make_augmenter,
        optax_global_norm,
    )

    axis = mesh.data_axis
    augmenter = make_augmenter(
        augment, elastic_alpha, elastic_sigma, three_class, border_boost,
        standardize, aug_gamma, aug_illum, aug_noise,
    )

    def local_grads(params, batch_stats, images, targets, weights, valid,
                    n_pix):
        def loss_fn(p):
            logits, new_bs = train_forward_lanes(
                p, batch_stats, images[..., None], model_cfg,
                # assume_valid: the feed divides evenly, so BN masking (and
                # its backward select_n over every activation) drops out
                item_mask=None if assume_valid else valid,
                interpret=interpret, axis_name=axis,
            )
            loss = _masked_mean_loss(
                logits, targets, weights, valid, n_pix=n_pix
            )
            return loss, new_bs
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.lax.psum(grads, axis)
        return loss, new_bs, grads

    def step(state: TrainState, images, masks, weights, valid, key):
        images, targets, weights = augmenter(images, masks, weights, key)
        out = output_size(images.shape[1])
        n_pix = (
            jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0) * out * out
        )
        sharded = jax.shard_map(
            local_grads,
            mesh=mesh.mesh,
            in_specs=(
                P(), P(), P(axis), P(axis), P(axis), P(axis), P(),
            ),
            out_specs=(P(), P(), P()),
            # pallas_call out_shapes carry no varying-mesh-axes annotation;
            # replication of the outputs is guaranteed by the explicit psums
            check_vma=False,
        )
        loss, new_bs, grads = sharded(
            state.params, state.batch_stats, images, targets, weights,
            valid, n_pix,
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    if not jit:
        return step
    repl = NamedSharding(mesh.mesh, P())
    batch_sh = NamedSharding(mesh.mesh, P(mesh.data_axis))
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, batch_sh, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_lanes_dp_epoch_step(
    mesh: MeshSpec,
    model_cfg,
    donate: bool = True,
    **step_kw,
) -> Callable:
    """Device-resident epoch-scan feed for the shard_map lanes step (the
    companion of train/steps.make_epoch_train_step for the path GSPMD
    cannot partition): the shard_map step runs as the scan body's inner
    step via make_epoch_train_step's inner_step hook, so the gather-by-
    index protocol, sharding constraints, and RNG discipline live in ONE
    place (train/steps.py)."""
    from unetseg_tpu.train.steps import make_epoch_train_step

    inner = make_lanes_dp_train_step(
        mesh, model_cfg, donate=False, jit=False, **step_kw
    )
    return make_epoch_train_step(
        None, donate=donate, mesh=mesh, inner_step=inner
    )


def replicate_state(mesh: MeshSpec, state: TrainState) -> TrainState:
    # host_put_tree == device_put single-process; multi-host it places only
    # this process's addressable replicas (core/distributed.py)
    from unetseg_tpu.core.distributed import host_put_tree

    return host_put_tree(state, mesh.replicated())


def shard_batch(mesh: MeshSpec, *arrays):
    from unetseg_tpu.core.distributed import host_put

    sh = mesh.batch_sharding()
    return tuple(host_put(np.asarray(a), sh) for a in arrays)
