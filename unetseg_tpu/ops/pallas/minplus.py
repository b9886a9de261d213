"""Pallas TPU kernel: blocked min-plus 'matmul' for the exact EDT.

The Euclidean distance transform decomposes into two min-plus products
(ops/edt.py): D[i,j] = min_k A[i,k] + B[k,j]. The MXU cannot evaluate the
(min, +) semiring, and the XLA formulation materializes (BLOCK, K, N)
broadcast intermediates in HBM. This kernel keeps an (M-block, N-block)
accumulator in VMEM and streams K-blocks through the VPU — the classic
tiled-matmul schedule under a different semiring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BM, _BK, _BN = 128, 128, 128
_BIG = 1e12  # python float: jnp scalars would be captured as kernel constants


def _minplus_kernel(a_ref, b_ref, out_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        out_ref[...] = jnp.full_like(out_ref, 1e12)

    a = a_ref[...]  # (BM, BK)
    b = b_ref[...]  # (BK, BN)
    # (BM, BK, BN) broadcast lives in VMEM/registers for one tile only
    cand = jnp.min(a[:, :, None] + b[None, :, :], axis=1)
    out_ref[...] = jnp.minimum(out_ref[...], cand)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=_BIG)


@functools.partial(jax.jit, static_argnames="interpret")
def minplus(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(M, K) x (K, N) -> (M, N) under (min, +), fp32."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    a_p = _pad_to(_pad_to(a.astype(jnp.float32), _BM, 0), _BK, 1)
    b_p = _pad_to(_pad_to(b.astype(jnp.float32), _BK, 0), _BN, 1)
    mp, kp = a_p.shape
    np_ = b_p.shape[1]
    out = pl.pallas_call(
        _minplus_kernel,
        grid=(mp // _BM, np_ // _BN, kp // _BK),
        in_specs=[
            pl.BlockSpec((_BM, _BK), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((_BK, _BN), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=interpret,
    )(a_p, b_p)
    return out[:m, :n]


def edt_sq_pallas(features: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Exact squared EDT via two Pallas min-plus products (see ops/edt.py)."""
    h, w = features.shape
    f = features.astype(jnp.bool_)
    i = jnp.arange(h, dtype=jnp.float32)
    dist_rows = (i[:, None] - i[None, :]) ** 2
    col_cost = jnp.where(f, 0.0, _BIG)
    g = minplus(dist_rows, col_cost, interpret=interpret)
    j = jnp.arange(w, dtype=jnp.float32)
    dist_cols = (j[:, None] - j[None, :]) ** 2
    d = minplus(g, dist_cols, interpret=interpret)
    return jnp.minimum(d, _BIG)
