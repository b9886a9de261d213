"""Does pre-padding spatial dims speed up XLA's NHWC TPU convs?

The bench-geometry middle convs run at 76-110 TF/s vs the ~190 the deep
stages hit (docs/PARITY.md); hypothesis: per-op internal re-layout/padding
of awkward spatial sizes is the gap. Measures each middle conv shape
native vs spatially padded (output sliced back), scan-slope timed.

Usage: python tools/kbench_pad.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI = 4, 24


def slope(fn, *args):
    for L in (LO, HI):
        float(fn(*args, length=L))
    ts = {}
    for L in (LO, HI, LO, HI):
        t0 = time.perf_counter()
        float(fn(*args, length=L))
        ts.setdefault(L, []).append(time.perf_counter() - t0)
    return (min(ts[HI]) - min(ts[LO])) / (HI - LO)


def bench(b, h, w, ci, co, pad_to=0, dtype=jnp.bfloat16):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, ci).astype(np.float32), dtype)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, dtype)

    def up(n):
        return n if pad_to == 0 else -(-n // pad_to) * pad_to

    hp, wp = up(h), up(w)

    @partial(jax.jit, static_argnames="length")
    def run(x, wt, length):
        def body(c, _):
            xp = jnp.pad(c, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, wt, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y[:, : h - 2, : w - 2]
            # sequential dependency: feed a shifted slice back
            c2 = c * 0.999 + jnp.pad(
                y[:, :, :, :ci] if co >= ci else jnp.tile(y, (1, 1, 1, ci // co)),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            ) * 1e-6
            return c2, ()

        out, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(out[0, 0, :8].astype(jnp.float32))

    t = slope(run, x, wt)
    fl = 2 * 9 * ci * co * (h - 2) * (w - 2) * b
    return t, fl / t / 1e12


def main():
    # the bench 700-tile middle conv shapes (16 frames/dispatch)
    shapes = [
        ("enc1c0", 16, 348, 348, 64, 128),
        ("enc1c1", 16, 346, 346, 128, 128),
        ("enc2c0", 16, 172, 172, 128, 256),
        ("enc2c1", 16, 170, 170, 256, 256),
        ("dec2c0", 16, 172, 172, 256, 128),
        ("dec2c1", 16, 170, 170, 128, 128),
    ]
    for name, b, h, w, ci, co in shapes:
        row = [name]
        for pad_to in (0, 8, 16, 128):
            t, tf = bench(b, h, w, ci, co, pad_to=pad_to)
            row.append(f"pad{pad_to}: {t * 1e3:7.2f} ms {tf:6.1f} TF/s")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
