"""Native (real-TPU, bf16) numerics check: lanes train step vs the Flax
train step — loss, grad norm, and one full SGD update's parameter drift.
Run from the repo root on the chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.core.config import Config
from unetseg_tpu.models.unet import UNet
from unetseg_tpu.train.state import create_train_state
from unetseg_tpu.train.steps import make_train_step


def main():
    cfg = Config()
    model = UNet(cfg=cfg.model)
    state0 = create_train_state(
        jax.random.key(0), model_cfg=cfg.model, input_size=512, model=model
    )
    b = cfg.train.batch_size
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(b, 512, 512), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 5, (b, 512, 512)), jnp.int32
    )
    wmaps = jnp.ones((b, 512, 512), jnp.float32)
    val = jnp.ones((b,), bool)
    key = jax.random.key(7)

    outs = {}
    for name, kw in [("flax", {}), ("lanes", {"lanes": True})]:
        step = make_train_step(model, augment=False, donate=False, **kw)
        st, metrics = step(state0, imgs, masks, wmaps, val, key)
        outs[name] = (
            float(metrics["loss"]),
            float(metrics["grad_norm"]),
            st,
        )
        print(f"{name}: loss={outs[name][0]:.6f} gnorm={outs[name][1]:.4f}",
              flush=True)

    pa, pb = outs["flax"][2].params, outs["lanes"][2].params
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), pa, pb
    )
    worst = max(jax.tree_util.tree_leaves(diffs))
    print(f"max param diff after 1 SGD step: {worst:.3e}")
    sa, sb = outs["flax"][2].batch_stats, outs["lanes"][2].batch_stats
    sdiffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), sa, sb
    )
    print(f"max batch-stats diff: {max(jax.tree_util.tree_leaves(sdiffs)):.3e}")


if __name__ == "__main__":
    main()
