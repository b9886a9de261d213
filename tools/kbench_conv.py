"""Isolated conv-kernel A/B on the real chip: v1 vs v2(rows) vs XLA.

Scan-slope timing: run L iterations inside one jitted lax.scan with a true
sequential dependency; time(L_hi)-time(L_lo) over (hi-lo) iterations.
Sync via tiny value fetch (block_until_ready does not sync the tunnel).
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from unetseg_tpu.ops.pallas.conv3x3 import (
    conv3x3_lanes, to_lanes, lane_stride,
)

LO, HI = 4, 44

def slope(fn, *args):
    # warm both lengths, then time
    for L in (LO, HI):
        float(fn(*args, length=L))
    ts = {}
    for L in (LO, HI, LO, HI):
        t0 = time.perf_counter()
        float(fn(*args, length=L))
        dt = time.perf_counter() - t0
        ts.setdefault(L, []).append(dt)
    return (min(ts[HI]) - min(ts[LO])) / (HI - LO)

def bench_lanes(b, h, w, ci, co, rows, pipelined, dtype=jnp.bfloat16):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, ci).astype(np.float32), dtype)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, dtype)
    s = jnp.ones((co, 1), jnp.float32)
    bb = jnp.zeros((co, 1), jnp.float32)
    xl = to_lanes(x)
    stride = lane_stride(w)

    @partial(jax.jit, static_argnames="length")
    def run(xl, wt, length):
        def body(c, _):
            y = conv3x3_lanes(c, wt, s, bb, stride, relu=True,
                              rows=rows, pipelined=pipelined)
            c2 = c * jnp.float32(0.999).astype(c.dtype) + jnp.pad(
                y, ((0, 2), (0, 0), (0, 0))).astype(c.dtype) * jnp.asarray(1e-6, c.dtype)
            return c2, ()
        out, _ = jax.lax.scan(body, xl, None, length=length)
        return out[0, 0, 0].astype(jnp.float32)

    return slope(run, xl, wt)

def bench_xla(b, h, w, ci, co, dtype=jnp.bfloat16):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, ci).astype(np.float32), dtype)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, dtype)

    @partial(jax.jit, static_argnames="length")
    def run(x, wt, length):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, wt, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype)
            y = jnp.maximum(y, 0)
            c2 = c * jnp.asarray(0.999, c.dtype) + jnp.pad(
                y, ((0, 0), (0, 2), (0, 2), (0, 0))) * jnp.asarray(1e-6, c.dtype)
            return c2, ()
        out, _ = jax.lax.scan(body, x, None, length=length)
        return out[0, 0, 0, 0].astype(jnp.float32)

    return slope(run, x, wt)

def gflop(b, h, w, ci, co):
    return 2 * 9 * ci * co * (h - 2) * (w - 2) * b / 1e9

if __name__ == "__main__":
    shapes = [(4, 510, 510, 64, 64), (4, 252, 252, 128, 128)]
    for (b, h, w, ci, co) in shapes:
        g = gflop(b, h, w, ci, co)
        for name, fn in [
            ("v1", lambda: bench_lanes(b, h, w, ci, co, 1, False)),
            ("v2r1", lambda: bench_lanes(b, h, w, ci, co, 1, True)),
            ("v2r2", lambda: bench_lanes(b, h, w, ci, co, 2, True)),
            ("xla", lambda: bench_xla(b, h, w, ci, co)),
        ]:
            try:
                t = fn()
                print(f"{b}x{h}x{w} ci{ci} co{co} {name:5s} "
                      f"{t*1e3:7.3f} ms  {g/t/1e3:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{b}x{h}x{w} ci{ci} co{co} {name:5s} FAIL {type(e).__name__}: {e}", flush=True)
