"""Fused-BN train-step A/B, interleaved in one process, scan-slope timed.

UNETSEG_FUSED_BN is read at trace time (models/lanes_train._use_fused_bn),
so toggling the env var between per-variant jits compares both formulations
under identical chip conditions. Variants interleave ref/fused twice to
ride out chip drift. Usage: python tools/fused_bn_ab.py [--aug]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LO = int(os.environ.get("AB_LO", "4"))
HI = int(os.environ.get("AB_HI", "24"))


def main(aug):
    from unetseg_tpu.core.config import Config
    from unetseg_tpu.models.unet import UNet
    from unetseg_tpu.train.state import create_train_state
    from unetseg_tpu.train.steps import make_train_step

    cfg = Config()
    model = UNet(cfg=cfg.model)
    state0 = create_train_state(
        jax.random.key(0), model_cfg=cfg.model, input_size=512, model=model
    )
    b = cfg.train.batch_size
    imgs = jnp.asarray(np.random.RandomState(0).rand(b, 512, 512), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 5, (b, 512, 512)), jnp.int32
    )
    wmaps = jnp.ones((b, 512, 512), jnp.float32)
    val = jnp.ones((b,), bool)

    kw = dict(augment=False, lanes=True)
    if aug:
        kw = dict(augment=True, aug_gamma=0.2, aug_illum=0.15, aug_noise=0.03,
                  standardize=True, lanes=True)

    def build():
        raw = make_train_step(model, donate=False, jit=False, **kw)

        @partial(jax.jit, static_argnames="length")
        def run(state, length):
            def body(carry, i):
                st, _ = carry
                key = jax.random.fold_in(jax.random.key(7), i)
                st, metrics = raw(st, imgs, masks, wmaps, val, key)
                return (st, metrics["loss"]), ()
            (st, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), jnp.arange(length))
            return loss

        return run

    runs = {}
    for name, env in (("ref", "0"), ("fused", "1")):
        os.environ["UNETSEG_FUSED_BN"] = env
        runs[name] = build()
        for L in (LO, HI):  # compile + warm
            float(runs[name](state0, L))

    ts = {"ref": {}, "fused": {}}
    for _ in range(2):  # interleave rounds
        for name in ("ref", "fused", "fused", "ref"):
            for L in (LO, HI):
                t0 = time.perf_counter()
                float(runs[name](state0, L))
                ts[name].setdefault(L, []).append(time.perf_counter() - t0)
    tag = "aug" if aug else "noaug"
    for name in ("ref", "fused"):
        per = (min(ts[name][HI]) - min(ts[name][LO])) / (HI - LO)
        print(f"{tag}-{name:6s} {per * 1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main("--aug" in sys.argv)
