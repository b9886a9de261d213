"""Train state: params + BatchNorm statistics + SGD-momentum optimizer.

The reference trains with torch SGD(lr=1e-4, momentum=0.99)
(reference: scripts/train.py:97) and keeps BN running stats inside the module.
Here everything lives in one pytree so a training step is a pure function
(state, batch, key) -> (state, metrics), trivially shardable and checkpointable.
optax.sgd's `trace` matches torch's momentum buffer exactly (no dampening,
no Nesterov).

Optional parameter EMA (TrainConfig.ema_decay > 0): the state carries a
shadow pytree of params + BN stats updated after every optimizer step with
the debiased decay min(decay, (1+t)/(10+t)). The update lives in
`apply_gradients` so every step factory (single-device jit, epoch scan,
shard_map data-parallel lanes) gets it without per-factory wiring.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct
from flax.training import train_state

from unetseg_tpu.core.config import Config, ModelConfig, TrainConfig
from unetseg_tpu.models.unet import UNet, init_unet


class TrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = None
    # EMA shadows (None when EMA is off — a *static* pytree-structure
    # difference, so programs compile once per mode).
    ema_params: Any = None
    ema_batch_stats: Any = None
    # static: not a leaf, baked into the compiled program
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, *, grads, **kwargs):
        state = super().apply_gradients(grads=grads, **kwargs)
        if self.ema_params is None:
            return state
        # debias: early steps track the raw params closely instead of the
        # random init; converges to the configured decay as t grows
        t = jnp.asarray(state.step, jnp.float32)
        d = jnp.minimum(jnp.float32(self.ema_decay), (1.0 + t) / (10.0 + t))

        def upd(e, p):
            return e + (1.0 - d) * (p.astype(e.dtype) - e)

        ema_p = jax.tree.map(upd, self.ema_params, state.params)
        ema_bs = (
            jax.tree.map(upd, self.ema_batch_stats, state.batch_stats)
            if self.ema_batch_stats is not None
            else None
        )
        return state.replace(ema_params=ema_p, ema_batch_stats=ema_bs)


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
    t_cfg = train_cfg or TrainConfig()
    ema = getattr(t_cfg, "ema_decay", 0.0) or 0.0
    ema_kw = {}
    if ema > 0:
        ema_kw = dict(
            ema_params=jax.tree.map(jnp.copy, variables["params"]),
            ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            ema_decay=float(ema),
        )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(t_cfg, steps_per_epoch),
        **ema_kw,
    )
