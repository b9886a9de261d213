"""Train-step A/B: remat policies and augmentation, scan-slope timed.

Scans the RAW (unjitted) step inside one compiled program so per-iteration
host dispatch (the ~27 ms tunnel round-trip) cancels out; large L deltas per
CLAUDE.md. Usage: python tools/trainstep_ab.py [variants...]
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

VARIANTS = {
    "base": dict(augment=False),
    "base-aug": dict(augment=True, aug_gamma=0.2, aug_illum=0.15, aug_noise=0.03,
                     standardize=True),
    "dots": dict(augment=False, remat="dots"),
    "dots_no_batch": dict(augment=False, remat="dots_no_batch"),
    "nothing": dict(augment=False, remat="nothing"),
    "dots-aug": dict(augment=True, aug_gamma=0.2, aug_illum=0.15, aug_noise=0.03,
                     standardize=True, remat="dots"),
    "lanes": dict(augment=False, lanes=True),
    "lanes-dots": dict(augment=False, lanes=True, remat="dots"),
    "lanes-aug": dict(augment=True, aug_gamma=0.2, aug_illum=0.15,
                      aug_noise=0.03, standardize=True, lanes=True),
    "lanes-dots-aug": dict(augment=True, aug_gamma=0.2, aug_illum=0.15,
                           aug_noise=0.03, standardize=True, lanes=True,
                           remat="dots"),
}


def main(names):
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

    for name in names:
        kw = VARIANTS[name]
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

        try:
            for L in (LO, HI):
                float(run(state0, L))
            ts = {}
            for L in (LO, HI, LO, HI):
                t0 = time.perf_counter()
                float(run(state0, L))
                ts.setdefault(L, []).append(time.perf_counter() - t0)
            per = (min(ts[HI]) - min(ts[LO])) / (HI - LO)
            print(f"{name:16s} {per * 1e3:8.2f} ms/step", flush=True)
        except Exception as e:
            print(f"{name:16s} FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "dots", "dots_no_batch", "nothing"]
    main(names)
