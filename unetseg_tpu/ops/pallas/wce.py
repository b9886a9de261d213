"""Pallas TPU kernel: fused weighted softmax cross-entropy (+ custom VJP).

The training loss multiplies per-pixel CE by the U-Net weight map and means
(reference: utils/losses.py:49-57). The XLA path (ops/losses.py) materializes
log-softmax and the gathered per-pixel loss; this kernel computes the
per-pixel weighted loss in one VMEM pass over (rows, classes) blocks and the
backward in another single pass producing d_logits = (softmax - onehot) * w
directly — no saved softmax residuals, logits are read twice total.

Shapes are flattened to (N*H*W, C); C is 2 for this model but the kernel is
written for any C <= 128 lane tile. Falls back to interpret mode off-TPU
(tests run it on CPU; `use_pallas_wce` in the train step enables it on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_BLOCK_ROWS = 1024


def _fwd_kernel(logits_ref, targets_ref, weights_ref, out_ref):
    lg = logits_ref[...].astype(jnp.float32)          # (B, C)
    t = targets_ref[...]                               # (B,)
    w = weights_ref[...].astype(jnp.float32)           # (B,)
    m = jnp.max(lg, axis=-1)
    lse = jnp.log(jnp.sum(jnp.exp(lg - m[:, None]), axis=-1)) + m
    c = lg.shape[-1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1) == t[:, None].astype(jnp.int32)
    )
    picked = jnp.sum(jnp.where(onehot, lg, 0.0), axis=-1)
    out_ref[...] = (lse - picked) * w


def _bwd_kernel(logits_ref, targets_ref, weights_ref, g_ref, dlogits_ref):
    lg = logits_ref[...].astype(jnp.float32)
    t = targets_ref[...]
    w = weights_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)                 # (B,) upstream cotangent
    m = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1) == t[:, None].astype(jnp.int32)
    ).astype(jnp.float32)
    dlogits_ref[...] = ((p - onehot) * (w * g)[:, None]).astype(dlogits_ref.dtype)


def _pad_rows(n: int) -> int:
    return -(-n // _BLOCK_ROWS) * _BLOCK_ROWS


def _call_fwd(logits2d, targets1d, weights1d, interpret):
    n, c = logits2d.shape
    grid = (n // _BLOCK_ROWS,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_ROWS,), lambda i: (i,)),
            pl.BlockSpec((_BLOCK_ROWS,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        interpret=interpret,
    )(logits2d, targets1d, weights1d)


def _call_bwd(logits2d, targets1d, weights1d, g1d, interpret):
    n, c = logits2d.shape
    grid = (n // _BLOCK_ROWS,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_ROWS,), lambda i: (i,)),
            pl.BlockSpec((_BLOCK_ROWS,), lambda i: (i,)),
            pl.BlockSpec((_BLOCK_ROWS,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), logits2d.dtype),
        interpret=interpret,
    )(logits2d, targets1d, weights1d, g1d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def weighted_ce_pixels(logits, targets, weights, interpret=False):
    """(N,H,W,C) logits, (N,H,W) int targets, (N,H,W) weights ->
    (N,H,W) per-pixel weighted CE, fp32. Differentiable wrt logits."""
    out, _ = _fwd_impl(logits, targets, weights, interpret)
    return out


def _flatten(logits, targets, weights):
    shape = targets.shape
    c = logits.shape[-1]
    n = int(np.prod(shape))
    n_pad = _pad_rows(n)
    lg = logits.reshape(n, c)
    t = targets.reshape(n).astype(jnp.int32)
    w = weights.reshape(n)
    if n_pad > n:
        lg = jnp.pad(lg, ((0, n_pad - n), (0, 0)))
        t = jnp.pad(t, (0, n_pad - n))
        w = jnp.pad(w, (0, n_pad - n))
    return lg, t, w, shape, n


def _fwd_impl(logits, targets, weights, interpret):
    lg, t, w, shape, n = _flatten(logits, targets, weights)
    out = _call_fwd(lg, t, w, interpret)[:n].reshape(shape)
    return out, (logits, targets, weights)


def _vjp_fwd(logits, targets, weights, interpret):
    return _fwd_impl(logits, targets, weights, interpret)


def _vjp_bwd(interpret, residuals, g):
    logits, targets, weights = residuals
    lg, t, w, shape, n = _flatten(logits, targets, weights)
    g_flat = g.reshape(-1)
    n_pad = lg.shape[0]
    if n_pad > n:
        g_flat = jnp.pad(g_flat, (0, n_pad - n))
    dlg = _call_bwd(lg, t, w, g_flat, interpret)[:n].reshape(logits.shape)
    return (dlg, None, None)


weighted_ce_pixels.defvjp(_vjp_fwd, _vjp_bwd)


def weighted_cross_entropy_pallas(logits, targets, weights, interpret=False):
    """Scalar mean like ops.losses.weighted_cross_entropy."""
    return jnp.mean(weighted_ce_pixels(logits, targets, weights, interpret))
