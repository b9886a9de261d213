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


def replicate_state(mesh: MeshSpec, state: TrainState) -> TrainState:
    return jax.device_put(state, mesh.replicated())


def shard_batch(mesh: MeshSpec, *arrays):
    sh = mesh.batch_sharding()
    return tuple(jax.device_put(np.asarray(a), sh) for a in arrays)
