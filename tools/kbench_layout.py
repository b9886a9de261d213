"""Does XLA's TPU conv care about nonstandard dimension numbers?

The tier-1 lanes forward pays two big boundary transposes (from_lanes /
to_lanes, ~5 ms of the 66.8 ms bench-geometry forward) to hand the middle
of the network to XLA in NHWC. But the lanes tensor (H, C, B*stride)
reshapes FOR FREE to (H, C, B, W=stride), and conv_general_dilated takes
arbitrary dimension_numbers — ("HCNW", "HWIO", "HCNW") expresses the same
conv with zero data movement at the boundary, IF the TPU backend doesn't
just transpose back to its canonical layout internally.

Scan-slope timing (same protocol as kbench_conv.py): run L iterations in a
jitted lax.scan with a sequential dependency; (t_hi - t_lo) / (hi - lo).
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LO, HI = 4, 44


def slope(fn, *args):
    for L in (LO, HI):
        float(fn(*args, length=L))
    ts = {}
    for L in (LO, HI, LO, HI):
        t0 = time.perf_counter()
        float(fn(*args, length=L))
        ts.setdefault(L, []).append(time.perf_counter() - t0)
    return (min(ts[HI]) - min(ts[LO])) / (HI - LO)


def bench(b, h, w, ci, co, dn, dtype=jnp.bfloat16):
    """dn: (lhs, rhs, out) dimension-number strings; lhs/out decide layout."""
    rs = np.random.RandomState(0)
    shape = [0, 0, 0, 0]
    for i, ch in enumerate(dn[0]):
        shape[i] = {"N": b, "H": h, "W": w, "C": ci}[ch]
    x = jnp.asarray(rs.rand(*shape).astype(np.float32), dtype)
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, dtype)

    @partial(jax.jit, static_argnames="length")
    def run(x, wt, length):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, wt, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=dtype,
            )
            return y, ()
        out, _ = jax.lax.scan(body, x, None, length=length)
        return out.reshape(-1)[0].astype(jnp.float32)

    return slope(run, x, wt)


if __name__ == "__main__":
    cases = [
        ("enc1", 16, 346, 346, 128, 128),
        ("enc2", 16, 170, 170, 256, 256),
        ("dec2", 16, 262, 262, 128, 128),
    ]
    layouts = [
        ("NHWC", ("NHWC", "HWIO", "NHWC")),
        ("HCNW", ("HCNW", "HWIO", "HCNW")),
        ("HWNC", ("HWNC", "HWIO", "HWNC")),
    ]
    for name, b, h, w, ci, co in cases:
        gf = b * h * w * ci * co * 9 * 2 / 1e9  # SAME-pad conv FLOPs
        row = [name]
        for lname, dn in layouts:
            t = bench(b, h, w, ci, co, dn)
            row.append(f"{lname} {t*1e3:7.2f} ms {gf/t/1e3:6.1f} TF/s")
        print("  ".join(row), flush=True)
