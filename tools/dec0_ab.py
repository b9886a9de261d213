"""Interleaved A/B of the fused decoder-entry train conv (UNETSEG_DEC0_FUSED)
and the tier-2 dense lanes region (UNETSEG_LANES_TIER2_TRAIN), scan-slope
timed on the chip. The env flags are read at trace time, so one process can
alternate variants A/B/A/B (fresh trace per variant) — interleaving guards
against slow chip-state drift polluting one arm.

Usage: python tools/dec0_ab.py [reps=2]
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

# label -> (env overrides, make_train_step kwargs)
AUG = dict(augment=True, aug_gamma=0.35, aug_illum=0.15, aug_noise=0.05,
           standardize=True, lanes=True)
NOAUG = dict(augment=False, lanes=True)
VARIANTS = {
    "t1-fused-aug":    ({"UNETSEG_DEC0_FUSED": "1"}, AUG),
    "t1-rollcat-aug":  ({"UNETSEG_DEC0_FUSED": "0"}, AUG),
    "t1-fused":        ({"UNETSEG_DEC0_FUSED": "1"}, NOAUG),
    "t1-rollcat":      ({"UNETSEG_DEC0_FUSED": "0"}, NOAUG),
    "t2-fused-aug":    ({"UNETSEG_DEC0_FUSED": "1",
                         "UNETSEG_LANES_TIER2_TRAIN": "1"}, AUG),
    "t2-rollcat-aug":  ({"UNETSEG_DEC0_FUSED": "0",
                         "UNETSEG_LANES_TIER2_TRAIN": "1"}, AUG),
    "t2-fused":        ({"UNETSEG_DEC0_FUSED": "1",
                         "UNETSEG_LANES_TIER2_TRAIN": "1"}, NOAUG),
    "t2-rollcat":      ({"UNETSEG_DEC0_FUSED": "0",
                         "UNETSEG_LANES_TIER2_TRAIN": "1"}, NOAUG),
    # EMA shadow cost on the recipe step (state carries ema trees)
    "t1-fused-aug-ema": ({"UNETSEG_DEC0_FUSED": "1"}, dict(AUG, _ema=True)),
}


def main(reps=2, names=None):
    from unetseg_tpu.core.config import Config
    from unetseg_tpu.models.unet import UNet
    from unetseg_tpu.train.state import create_train_state
    from unetseg_tpu.train.steps import make_train_step

    from unetseg_tpu.core.config import TrainConfig

    cfg = Config()
    model = UNet(cfg=cfg.model)
    state0 = create_train_state(
        jax.random.key(0), model_cfg=cfg.model, input_size=512, model=model
    )
    state_ema = create_train_state(
        jax.random.key(0), model_cfg=cfg.model, input_size=512, model=model,
        train_cfg=TrainConfig(ema_decay=0.999),
    )
    b = cfg.train.batch_size
    imgs = jnp.asarray(np.random.RandomState(0).rand(b, 512, 512), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 5, (b, 512, 512)), jnp.int32
    )
    wmaps = jnp.ones((b, 512, 512), jnp.float32)
    val = jnp.ones((b,), bool)

    names = names or list(VARIANTS)
    results = {n: [] for n in names}
    compiled = {}

    def build(name):
        env, kw = VARIANTS[name]
        kw = dict(kw)
        st0 = state_ema if kw.pop("_ema", False) else state0
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            raw = make_train_step(model, donate=False, jit=False, **kw)

            @partial(jax.jit, static_argnames="length")
            def run(state, length):
                def body(carry, i):
                    st, _ = carry
                    key = jax.random.fold_in(jax.random.key(7), i)
                    st, metrics = raw(st, imgs, masks, wmaps, val, key)
                    return (st, metrics["loss"]), ()

                (st, loss), _ = jax.lax.scan(
                    body, (state, jnp.float32(0)), jnp.arange(length)
                )
                return loss

            for L in (LO, HI):
                float(run(st0, L))  # compile with env set (trace time)
            return run, st0
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for name in names:
        try:
            compiled[name] = build(name)  # (run, state)
        except Exception as e:
            print(f"{name:18s} COMPILE-FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            results.pop(name, None)

    for rep in range(reps):
        for name in list(results):
            run, st0 = compiled[name]
            ts = {}
            for L in (LO, HI, LO, HI):
                t0 = time.perf_counter()
                float(run(st0, L))
                ts.setdefault(L, []).append(time.perf_counter() - t0)
            per = (min(ts[HI]) - min(ts[LO])) / (HI - LO)
            results[name].append(per * 1e3)
            print(f"rep{rep} {name:18s} {per * 1e3:8.2f} ms/step", flush=True)

    print("\n== best-of-reps ==")
    for name, vals in results.items():
        if vals:
            print(f"{name:18s} {min(vals):8.2f} ms/step")


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    main(reps, sys.argv[2:] or None)
