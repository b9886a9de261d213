"""Per-stage isolated timings of the tier-1 lanes kernels at the bench
geometry (700-input tile, batch 16): stem, enc0c1(+pool), up3 tconv,
dec3 conv0 (fused skip crop), dec3 conv1.

Scan-slope timing (see bench.py): each iteration feeds a cheap function of
the output back into the input so iterations are sequential; sync via a
scalar fetch. Usage: python tools/kbench_tier1.py [stage ...]
"""
import sys, time, os
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

from unetseg_tpu.ops.pallas.conv3x3 import (
    conv3x3_phase2, dec_conv0_phase2, enc0_fused_phase2, tconv2x2_phase2,
    lane_stride,
)

LO, HI = 4, 24
B = int(os.environ.get("KB_B", "16"))
S = int(os.environ.get("KB_S", "700"))
DT = jnp.bfloat16


def slope(fn, *args):
    for L in (LO, HI):
        float(fn(*args, length=L))
    ts = {}
    for L in (LO, HI, LO, HI, LO, HI):
        t0 = time.perf_counter()
        float(fn(*args, length=L))
        ts.setdefault(L, []).append(time.perf_counter() - t0)
    return (min(ts[HI]) - min(ts[LO])) / (HI - LO)


def mk(shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype(np.float32), DT
    )


def timed(name, build):
    """build() -> (step_fn(carry) -> carry-like, x0, flops).

    ONE compile per stage: dynamic-trip-count fori_loop (compiles to a
    while loop), length passed as a runtime scalar — pallas-kernel compiles
    through the tunnel cost minutes each, so the two slope lengths must
    share a program."""
    step, x0, flops = build()

    @jax.jit
    def run(x0, length):
        out = jax.lax.fori_loop(0, length, lambda i, c: step(c), x0)
        return out.reshape(-1)[0].astype(jnp.float32)

    t0 = time.time()
    dt = slope(run, x0)
    print(f"{name:12s} {dt*1e3:7.3f} ms   {flops/dt/1e12:6.1f} TF/s useful"
          f"   [{time.time()-t0:.0f}s incl compile]", flush=True)
    return dt


def main():
    st0 = lane_stride(-(-S // 2))          # 384 at S=700
    lanes = B * st0
    f0 = 64
    sh_in = S                               # stem input rows
    e1 = S - 2                              # stem out rows (valid)
    e2 = S - 4                              # enc0c1 out rows
    up_w = 520 if S == 700 else None        # sh.crops[-1] at 700
    assert up_w is not None, "bench geometry only"
    row_off = (e2 - up_w) // 2

    want = set(sys.argv[1:])

    def sel(n):
        return not want or n in want

    one = jnp.ones((f0, 1), jnp.float32)
    zb = jnp.zeros((f0, 1), jnp.float32)

    if sel("stem"):
        xl = mk((sh_in, 8, lanes))
        k0 = mk((3, 3, 4, f0), 1)
        flops = 2 * 9 * 1 * f0 * e1 * (S // 2) * 2 * B  # useful (ci=1)

        def build():
            def step(c):
                y = conv3x3_phase2(c, k0, one, zb, st0,
                                   h_valid=sh_in, raw_rows=True)
                return c * jnp.asarray(0.999, DT) + y[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT)
            return step, xl, flops
        timed("stem", build)

    if sel("enc0c1"):
        h = mk((e1 + 10, 2 * f0, lanes))
        k1 = mk((3, 3, f0, f0), 2)
        flops = 2 * 9 * f0 * f0 * e2 * (S // 2) * 2 * B

        def build():
            def step(c):
                y, p = conv3x3_phase2(c, k1, one, zb, st0, fuse_pool=True,
                                      h_valid=e1, raw_rows=True)
                return c * jnp.asarray(0.999, DT) + y[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT)
            return step, h, flops
        timed("enc0c1", build)

    if sel("enc0f"):
        xl = mk((sh_in, 8, lanes))
        k0 = mk((3, 3, 4, f0), 1)
        k1 = mk((3, 3, f0, f0), 2)
        # compare against stem + enc0c1 (their carry overheads differ; the
        # carry here is the small ingest tensor, so enc0f's number is clean)
        flops = 2 * 9 * f0 * f0 * e2 * (S // 2) * 2 * B

        def build():
            def step(c):
                skip, pool = enc0_fused_phase2(c, k0, zb, k1, zb, st0,
                                               h_valid=sh_in)
                return (c * jnp.asarray(0.999, DT)
                        + skip[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT)
                        + pool[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT))
            return step, xl, flops
        timed("enc0f", build)

    if sel("tconv"):
        tl = mk((264, 2 * f0, lanes))
        kt = mk((2, 2, 2 * f0, f0), 3)
        bt = jnp.zeros((f0, 1), jnp.float32)
        flops = 2 * 4 * 2 * f0 * f0 * 260 * 260 * B

        def build():
            def step(c):
                y = tconv2x2_phase2(c, kt, bt, st0, h_valid=260,
                                    raw_rows=True)
                return c * jnp.asarray(0.999, DT) + y[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT)
            return step, tl, flops
        timed("tconv", build)

    if sel("dec3c0"):
        skip = mk((e2 + 8, 2 * f0, lanes))
        up = mk((up_w + 8, 2 * f0, lanes), 4)
        kd = mk((3, 3, 2 * f0, f0), 5)
        flops = 2 * 9 * 2 * f0 * f0 * (up_w - 2) * (up_w - 2) * B

        def build():
            def step(c):
                y = dec_conv0_phase2(skip, c, kd, one, zb, st0,
                                     out_rows=up_w - 2, row_off=row_off,
                                     lane_off=row_off // 2, raw_rows=True)
                return c * jnp.asarray(0.999, DT) + y[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT)
            return step, up, flops
        timed("dec3c0", build)

    if sel("dec3c1"):
        y0 = mk((up_w + 6, 2 * f0, lanes))
        k1 = mk((3, 3, f0, f0), 6)
        flops = 2 * 9 * f0 * f0 * (up_w - 4) * (up_w - 4) * B

        def build():
            def step(c):
                y = conv3x3_phase2(c, k1, one, zb, st0,
                                   h_valid=up_w - 2, raw_rows=True)
                return c * jnp.asarray(0.999, DT) + y[0, 0, 0].astype(DT) * jnp.asarray(1e-6, DT)
            return step, y0, flops
        timed("dec3c1", build)


if __name__ == "__main__":
    main()
