"""Train state: params + BatchNorm statistics + SGD-momentum optimizer.

The reference trains with torch SGD(lr=1e-4, momentum=0.99)
(reference: scripts/train.py:97) and keeps BN running stats inside the module.
Here everything lives in one pytree so a training step is a pure function
(state, batch, key) -> (state, metrics), trivially shardable and checkpointable.
optax.sgd's `trace` matches torch's momentum buffer exactly (no dampening,
no Nesterov).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import core
from flax.training import train_state

from unetseg_tpu.core.config import Config, ModelConfig, TrainConfig
from unetseg_tpu.models.unet import UNet, init_unet


class TrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = None


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    """SGD momentum 0.99 by default (the reference's optimizer,
    scripts/train.py:97); adam/adamw and cosine decay as improved recipes."""
    lr: Any = cfg.learning_rate
    if cfg.cosine_decay and steps_per_epoch:
        lr = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.num_epochs * steps_per_epoch
        )
    if cfg.optimizer == "sgd":
        return optax.sgd(lr, momentum=cfg.momentum)
    if cfg.optimizer == "adam":
        return optax.adam(lr)
    if cfg.optimizer == "adamw":
        return optax.adamw(lr, weight_decay=cfg.weight_decay)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def create_train_state(
    rng: jax.Array,
    model_cfg: Optional[ModelConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    input_size: int = 512,
    model: Optional[UNet] = None,
    steps_per_epoch: Optional[int] = None,
) -> TrainState:
    model = model or UNet(cfg=model_cfg or ModelConfig())
    variables = init_unet(model, rng, input_size=input_size)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(train_cfg or TrainConfig(), steps_per_epoch),
    )
