"""cblock (in-VMEM im2col) conv kernel vs XLA on the slow middle shapes.

The third documented negative family (ROADMAP item 34) ruled out pre-pad,
XLA-level dot9, and the dense-lanes tier-2 region for the 58-110 TF/s
middle NHWC convs. conv_cblock.py is the remaining formulation: the 9-tap
expansion built inside VMEM feeding one large MXU dot per 8-row block,
with zero layout handoffs. This measures it per stage against XLA's conv
(both with the bias+ReLU epilogue the real network fuses), scan-slope
method, large deltas.

Usage: python tools/kbench_cblock.py
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


def bench(b, h, w, ci, co, mode, dtype=jnp.bfloat16):
    from unetseg_tpu.ops.pallas.conv_cblock import conv3x3_cblock

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, ci).astype(np.float32), dtype)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, dtype)
    bias = jnp.asarray(rs.rand(co).astype(np.float32))

    @partial(jax.jit, static_argnames="length")
    def run(x, wt, bias, length):
        def body(c, _):
            if mode == "conv":
                y = jax.lax.conv_general_dilated(
                    c, wt, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=c.dtype,
                )
                y = jnp.maximum(y + bias.astype(c.dtype), 0)
            else:
                y = conv3x3_cblock(c, wt, bias, mode=mode)
            ysum = jnp.sum(y, axis=-1, keepdims=True).astype(c.dtype)
            c2 = c * 0.999 + jnp.pad(
                jnp.broadcast_to(ysum, y.shape[:3] + (ci,)),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            ) * 1e-6
            return c2, ()

        out, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(out[0, 0, :8].astype(jnp.float32))

    t = slope(run, x, wt, bias)
    fl = 2 * 9 * ci * co * (h - 2) * (w - 2) * b
    return t, fl / t / 1e12


def main():
    shapes = [
        ("enc1c0", 16, 348, 348, 64, 128),
        ("enc1c1", 16, 346, 346, 128, 128),
        ("enc2c1", 16, 170, 170, 256, 256),
        ("dec2c0", 16, 172, 172, 256, 128),
        ("dec2c1", 16, 170, 170, 128, 128),
        ("dec3c1", 16, 342, 342, 64, 64),  # CO<128: cblock pads, fairness check
    ]
    for name, b, h, w, ci, co in shapes:
        row = [name]
        for mode in ("conv", "im2col", "dots9"):
            if mode != "conv" and co % 128:
                row.append("cblock:   n/a (CO<128)")
                continue
            try:
                t, tf = bench(b, h, w, ci, co, mode)
                row.append(f"{mode}: {t * 1e3:7.2f} ms {tf:6.1f} TF/s")
            except Exception as e:  # compile failures are data too
                row.append(f"{mode}: FAIL {type(e).__name__}: {str(e)[:120]}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
