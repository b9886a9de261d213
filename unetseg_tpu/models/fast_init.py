"""Fast structural initialization.

`model.init` executes the whole forward pass, which costs minutes for the
full-width net on a cold compile (remote TPU compile or single-core CPU).
Benchmarks and compile-checks only need *correctly shaped* variables with
sane statistics, so this builds the variable tree from `jax.eval_shape`
(pure tracing) and fills leaves by role: conv kernels ~ N(0, 0.05), biases 0,
BatchNorm scale/var 1, mean 0. Training still uses the real Kaiming init via
models.unet.init_unet.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from unetseg_tpu.models.unet import UNet


def fast_random_variables(
    model: UNet, rng: jax.Array, input_size: int = 512, batch: int = 1
) -> Dict[str, Any]:
    x = jax.ShapeDtypeStruct(
        (batch, input_size, input_size, model.cfg.in_channels), jnp.float32
    )
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.key(0), xx, train=False), x
    )

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    # one jitted program for the whole tree: ~60 separate dispatches would
    # each pay full launch latency (hundreds of ms over a remote-TPU tunnel)
    @jax.jit
    def build(rng):
        keys = jax.random.split(rng, len(flat))
        leaves = []
        for (path, leaf), k in zip(flat, keys):
            name = jax.tree_util.keystr(path)
            if "kernel" in name:
                val = jax.random.normal(k, leaf.shape, leaf.dtype) * 0.05
            elif "scale" in name or "var" in name:
                val = jnp.ones(leaf.shape, leaf.dtype)
            else:  # bias, mean
                val = jnp.zeros(leaf.shape, leaf.dtype)
            leaves.append(val)
        return leaves

    return jax.tree_util.tree_unflatten(treedef, build(rng))
