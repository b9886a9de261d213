"""3x3 conv as 9 shifted 1x1 matmuls vs lax.conv, on the slow middle shapes.

kbench_pad.py showed spatial padding does NOT fix the 62-110 TF/s middle
convs (XLA's conv lowering is the binder, not re-layout). A 1x1 conv is a
clean [B*H*W, CI] x [CI, CO] matmul that XLA runs near peak; a 3x3 VALID
conv = sum over 9 taps of shifted 1x1s. Whether XLA fuses the 9
accumulations (or the f32 accumulator traffic drowns the matmul win) is an
empirical question — this measures it.

Usage: python tools/kbench_dot9.py
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


def conv_dot9(x, wt):
    """3x3 VALID conv via 9 shifted 1x1 contractions (NHWC)."""
    b, h, w, ci = x.shape
    co = wt.shape[3]
    acc = None
    for ky in range(3):
        for kx in range(3):
            xs = x[:, ky : h - 2 + ky, kx : w - 2 + kx, :]
            y = jax.lax.dot_general(
                xs, wt[ky, kx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


def bench(b, h, w, ci, co, mode, dtype=jnp.bfloat16):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, ci).astype(np.float32), dtype)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, dtype)

    @partial(jax.jit, static_argnames="length")
    def run(x, wt, length):
        def body(c, _):
            if mode == "conv":
                y = jax.lax.conv_general_dilated(
                    c, wt, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                y = conv_dot9(c, wt)
            # sequential dependency; consume ALL co channels so XLA cannot
            # dead-code part of the contraction
            ysum = jnp.sum(y, axis=-1, keepdims=True).astype(c.dtype)
            c2 = c * 0.999 + jnp.pad(
                jnp.broadcast_to(ysum, y.shape[:3] + (ci,)),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            ) * 1e-6
            return c2, ()

        out, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(out[0, 0, :8].astype(jnp.float32))

    t = slope(run, x, wt)
    fl = 2 * 9 * ci * co * (h - 2) * (w - 2) * b
    return t, fl / t / 1e12


def main():
    shapes = [
        ("enc1c0", 16, 348, 348, 64, 128),
        ("enc1c1", 16, 346, 346, 128, 128),
        ("enc2c1", 16, 170, 170, 256, 256),
        ("dec2c0", 16, 172, 172, 256, 128),
        ("dec2c1", 16, 170, 170, 128, 128),
        ("dec3c0", 16, 344, 344, 128, 64),
        ("dec3c1", 16, 342, 342, 64, 64),
    ]
    for name, b, h, w, ci, co in shapes:
        row = [name]
        for mode in ("conv", "dot9"):
            t, tf = bench(b, h, w, ci, co, mode)
            row.append(f"{mode}: {t * 1e3:7.2f} ms {tf:6.1f} TF/s")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
