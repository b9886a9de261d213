"""UNETSEG_BN_TIE=y train-step A/B, interleaved, scan-slope timed.

The fused-BN backward is VPU-op-bound (the r7 MXU-reduce "dots" A/B was
neutral), so the lever is per-element op count: tie-from-y replaces the
pre = z*a+b recompute (fma + 2 cmp + 2 select) with one compare against
the saved forward output in BOTH backward passes (G1/G2 reduce and dz).
Semantics change only at exact pre == 0 (ReLU tie 0.5 -> 0, the torch
convention the reference uses — models/unet_model.py's nn.ReLU).

Also prints the one-step max param-grad drift between modes (expected
~0 on random data: ties at exact pre == 0 are measure-zero).

Usage: python tools/bn_tie_ab.py [--aug]
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

        def one(state):
            key = jax.random.key(7)
            st, _ = jax.jit(raw)(state, imgs, masks, wmaps, val, key)
            return st.params

        return run, one

    os.environ["UNETSEG_FUSED_BN"] = "1"
    runs, params1 = {}, {}
    for name, env in (("pre", ""), ("tie-y", "y")):
        os.environ["UNETSEG_BN_TIE"] = env
        runs[name], one = build()
        # the env flag is read at TRACE time, so the one-step parity
        # params must be computed inside this loop, while the flag is set
        params1[name] = one(state0)
        for L in (LO, HI):  # compile + warm
            float(runs[name](state0, L))

    # one-step parity drift
    pa = params1["pre"]
    pb = params1["tie-y"]
    drift = max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(jax.tree_util.tree_leaves(pa),
                        jax.tree_util.tree_leaves(pb))
    )
    print(f"one-step param drift pre vs tie-y: {drift:.3e}", flush=True)

    ts = {"pre": {}, "tie-y": {}}
    for _ in range(2):  # interleave rounds
        for name in ("pre", "tie-y", "tie-y", "pre"):
            for L in (LO, HI):
                t0 = time.perf_counter()
                float(runs[name](state0, L))
                ts[name].setdefault(L, []).append(time.perf_counter() - t0)
    tag = "aug" if aug else "noaug"
    for name in ("pre", "tie-y"):
        per = (min(ts[name][HI]) - min(ts[name][LO])) / (HI - LO)
        print(f"{tag}-{name:6s} {per * 1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main("--aug" in sys.argv)
