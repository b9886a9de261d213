"""Trace-level attribution for the sub-roofline middle NHWC convs.

VERDICT-r4 item 1 asks what physically binds the 58-110 TF/s middle convs
(vs the ~190 TF/s deep stages). This traces a scan of ONE conv shape at a
time (bias+ReLU epilogue, same as the net) through jax.profiler and rolls
up the device plane: if the conv is a single fusion with no surrounding
copy/pad/transpose ops, the time is inside XLA's conv emitter itself for
that geometry — not layout churn around it — and the per-stage TF/s here
should match the in-context numbers from tools/profile_step.py bench.

    python tools/kprofile_conv.py            # all stages
    python tools/kprofile_conv.py enc1c0     # one stage
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_step import parse  # same trace-plane rollup

SHAPES = {
    # name: (b, h, w, ci, co) — in-context tile geometries (PROF_SIZE=700).
    # Keep in sync with tools/kbench_cblock.py's table (same stages; this
    # one adds enc2c0 + the deep enc4c1 contrast, drops the CO<128 dec3c1
    # the cblock kernel cannot run).
    "enc1c0": (16, 348, 348, 64, 128),
    "enc1c1": (16, 346, 346, 128, 128),
    "enc2c0": (16, 172, 172, 128, 256),
    "enc2c1": (16, 170, 170, 256, 256),
    "dec2c0": (16, 172, 172, 256, 128),
    "dec2c1": (16, 170, 170, 128, 128),
    "enc4c1": (16, 39, 39, 1024, 1024),   # deep roofline stage, for contrast
}
ITERS = 3
LEN = 12


def trace_one(name, tmpdir):
    b, h, w, ci, co = SHAPES[name]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, ci).astype(np.float32), jnp.bfloat16)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    bias = jnp.asarray(rs.rand(co).astype(np.float32))

    @jax.jit
    def run(x, wt, bias):
        # Python-unrolled (NOT lax.scan): scan bodies trace as one opaque
        # `while` op in the profiler device plane; unrolling keeps every
        # conv a separately attributed op.
        c = x
        for _ in range(LEN):
            with jax.named_scope(name):
                y = jax.lax.conv_general_dilated(
                    c, wt, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=c.dtype,
                )
                y = jnp.maximum(y + bias.astype(c.dtype), 0)
            ysum = jnp.sum(y, axis=-1, keepdims=True).astype(c.dtype)
            c = c * 0.999 + jnp.pad(
                jnp.broadcast_to(ysum, y.shape[:3] + (ci,)),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            ) * 1e-6
        return jnp.sum(c[0, 0, :8].astype(jnp.float32))

    float(run(x, wt, bias))  # compile+warm
    with jax.profiler.trace(tmpdir):
        for _ in range(ITERS):
            float(run(x, wt, bias))
    fl = 2 * 9 * ci * co * (h - 2) * (w - 2) * b * LEN
    return fl


def main():
    names = sys.argv[1:] or list(SHAPES)
    for name in names:
        tmpdir = f"/tmp/kprof_{name}"
        os.system(f"rm -rf {tmpdir}")
        fl = trace_one(name, tmpdir)
        # parse() prints ms per TRACE iteration = LEN unrolled convs, so
        # TF/s for one conv = (GFLOP/conv x LEN) / (conv-op ms/iter)
        print(f"\n===== {name} {SHAPES[name]}  ({fl/LEN/1e9:.1f} GFLOP/conv"
              f" x {LEN} unrolled convs per iter) =====")
        parse(tmpdir, n_iters=ITERS)


if __name__ == "__main__":
    main()
