"""Fused custom-VJP BatchNorm(+ReLU) for the training forwards.

The profiled no-aug train step (45.6 ms) spends ~16.5 ms in loop-fusion
elementwise/reduction passes, dominated by the BatchNorm statistics and
their backward: XLA autodiff of the hand-written masked one-pass
E[x^2]-E[x]^2 math re-reads the big activation tensors once per derived
quantity (5.6 ms of broadcast-transpose reduce_sum, 2.7 ms of garbage-row
`where` select_n, plus mul/add_any assembly). This module computes the
same function with a hand-written VJP at the minimum pass count:

  forward : one masked-reduction read (s, sq) + one normalize+ReLU pass
  backward: one reduction read (G1, G2 over g'.z and g') + one dz pass

The `where` row/lane masking folds into those passes (no standalone
select_n), and all reductions accumulate in fp32 (autodiff accumulates the
scale/bias grads in the activation dtype, so the fused path is *more*
accurate in bf16).

Semantics are exactly the lanes/NHWC BN helpers in models/lanes_train.py:
masked one-pass fp32 batch statistics, torch-unbiased running update
(reference: the BatchNorm2d in models/unet_model.py:12-17), ReLU tie
gradient 0.5 and var-clamp tie gradient 0.5 (JAX `maximum` convention),
and `axis_name` psums for shard_map data parallelism — the moment sums
psum in the forward, the stats-path cotangents psum in the backward
(transpose-of-psum), so DP gradients equal single-device exactly after the
step's outer grad psum.

Three layout variants:
  make_bn_relu_p2    — 2-phase lanes tensors (Hbuf, 2*nch, L)
  make_bn_relu_dense — dense lanes tensors (Hbuf, nch, L)
  make_bn_relu_nhwc  — NHWC conv outputs (B, H, W, C)

Each factory takes the static geometry and returns
  fn(z, gamma, beta, run_mean, run_var[, item_mask]) -> (y, new_mean, new_var)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _tie(x):
    """Gradient factor of jnp.maximum(x, 0): 1 / 0.5 / 0 (JAX convention)."""
    return jnp.where(x > 0, 1.0, jnp.where(x < 0, 0.0, 0.5)).astype(jnp.float32)


def _bwd_reduce_mode() -> str:
    """Formulation of the backward G1/G2 reductions (A/B switch):
    "sum" — multi-axis jnp.sum (the shipped form); "dots" — contract the
    lane dim with a ones-vector dot_general first (MXU does cross-lane
    reductions natively; the multi-axis reduce measured ~3x the roofline
    read cost on v5e)."""
    return os.environ.get("UNETSEG_BN_BWD", "sum")


def _tie_from_y() -> bool:
    """A/B switch (UNETSEG_BN_TIE=y): derive the ReLU gradient gate in the
    backward from the SAVED forward output (y > 0) instead of recomputing
    pre = z*a+b. The backward reduce/dz passes are VPU-op-bound, not
    bandwidth-bound (the r7 "dots" MXU-reduce A/B was neutral), so cutting
    the per-element op count — one compare replaces an fma + two compares
    + two selects, in BOTH the G1/G2 pass and the dz pass — is the lever.
    y > 0 iff pre > 0 exactly; the only behavior change is the
    measure-zero pre == 0 tie (0.5 -> 0), which matches the reference's
    torch ReLU backward (grad 0 at input 0) rather than JAX's maximum
    convention. y is already live as the downstream conv's residual, so
    saving it adds no HBM footprint."""
    return os.environ.get("UNETSEG_BN_TIE", "") == "y"


def _reduce2(gp, z, axes, lane_axis):
    """G1 = sum(gp*z), G2 = sum(gp) over `axes`, f32 accumulation.
    mode "dots": contract the minor (lane) axis on the MXU via a ones
    vector, then finish the remaining axes with a plain sum."""
    if _bwd_reduce_mode() != "dots":
        G1 = jnp.sum(gp * z, axis=axes, dtype=jnp.float32)
        G2 = jnp.sum(gp, axis=axes, dtype=jnp.float32)
        return G1, G2
    ones = jnp.ones((gp.shape[lane_axis],), gp.dtype)
    dn = (((lane_axis,), (0,)), ((), ()))
    g1 = jax.lax.dot_general(
        gp * z, ones, dn, preferred_element_type=jnp.float32
    )
    g2 = jax.lax.dot_general(
        gp, ones, dn, preferred_element_type=jnp.float32
    )
    rest = tuple(a - (1 if a > lane_axis else 0) for a in axes if a != lane_axis)
    return jnp.sum(g1, axis=rest), jnp.sum(g2, axis=rest)


def _finish_stats(s, sq, n, run_mean, run_var, momentum):
    n = jnp.maximum(n, 1.0)
    mean = s / n
    var_raw = sq / n - jnp.square(mean)
    var = jnp.maximum(var_raw, 0.0)
    unbias = n / jnp.maximum(n - 1.0, 1.0)
    new_mean = momentum * run_mean + (1 - momentum) * mean
    new_var = momentum * run_var + (1 - momentum) * var * unbias
    return mean, var_raw, var, n, unbias, new_mean, new_var


# ------------------------------------------------------------ 2-phase lanes
def make_bn_relu_p2(nch: int, h_valid: int, w_valid: int, item_stride: int,
                    momentum: float, eps: float, relu: bool = True,
                    masked: bool = False,
                    axis_name: Optional[str] = None):
    """BN+ReLU on a 2-phase lanes tensor z (Hbuf, 2*nch, L): channel c and
    c+nch are the same logical channel (even/odd output columns). Garbage
    rows >= h_valid are zeroed before the affine (NaN hygiene), garbage
    lanes are finite and excluded from the statistics by the per-phase lane
    masks. Matches models/lanes_train._bn_relu_lanes bit-for-bit in the
    forward."""

    def _masks(L):
        # (2, L) phase-lane mask: one reduction/`where` op over the free
        # (H, 2, nch, L) reshape instead of slice-wise sums per phase —
        # sibling single reductions multi-output fuse; sliced ones may not
        n_items = L // item_stride
        lane = jnp.arange(item_stride)
        m0 = jnp.tile(lane < -(-w_valid // 2), n_items)
        m1 = jnp.tile(lane < w_valid // 2, n_items)
        return jnp.stack([m0, m1])

    def _fwd_math(z, gamma, beta, run_mean, run_var, item_mask):
        H, C2, L = z.shape
        rowm = (jnp.arange(H) < h_valid)[:, None, None]
        z0 = jnp.where(rowm, z, 0)
        m = _masks(L)
        if masked:
            im = jnp.repeat(item_mask, item_stride)
            m = m & im[None, :]
            n = jnp.sum(item_mask.astype(jnp.float32)) * h_valid * w_valid
        else:
            n = jnp.float32((L // item_stride) * h_valid * w_valid)
        zm = jnp.where(m[None, :, None, :], z0.reshape(H, 2, nch, L), 0)
        s = jnp.sum(zm, axis=(0, 1, 3), dtype=jnp.float32)
        sq = jnp.sum(jnp.square(zm), axis=(0, 1, 3), dtype=jnp.float32)
        if axis_name is not None:
            s, sq, n = jax.lax.psum((s, sq, n), axis_name)
        mean, var_raw, var, nn, unbias, new_mean, new_var = _finish_stats(
            s, sq, n, run_mean, run_var, momentum
        )
        inv = jax.lax.rsqrt(var + eps)
        a = gamma * inv
        b = beta - mean * a
        a2 = jnp.concatenate([a, a])
        b2 = jnp.concatenate([b, b])
        if z.dtype != jnp.float32:
            a2, b2 = a2.astype(z.dtype), b2.astype(z.dtype)
        y = z0 * a2[None, :, None] + b2[None, :, None]
        if relu:
            y = jnp.maximum(y, 0)
        return y, new_mean, new_var, (mean, var_raw, var, nn, unbias, a2, b2)

    @jax.custom_vjp
    def fn(z, gamma, beta, run_mean, run_var, item_mask):
        y, new_mean, new_var, _ = _fwd_math(
            z, gamma, beta, run_mean, run_var, item_mask
        )
        return y, new_mean, new_var

    def fwd(z, gamma, beta, run_mean, run_var, item_mask):
        y, new_mean, new_var, res = _fwd_math(
            z, gamma, beta, run_mean, run_var, item_mask
        )
        mean, var_raw, var, n, unbias, a2, b2 = res
        ytie = (y,) if relu and _tie_from_y() else ()
        return (y, new_mean, new_var), (
            z, gamma, item_mask, mean, var_raw, var, n, unbias, a2, b2,
        ) + ytie

    def bwd(res, cts):
        # Everything elementwise stays in the activation dtype (bf16 in
        # production): the reductions accumulate in fp32 via jnp.sum dtype,
        # which matches autodiff's precision while each pass reads only
        # bf16 arrays — an explicit .astype(f32) on the full tensors here
        # measured +5 ms/step of materialized converts/muls.
        gy, ct_mean, ct_var = cts
        z, gamma, item_mask, mean, var_raw, var, n, unbias, a2, b2 = res[:10]
        H, C2, L = z.shape
        inv = jax.lax.rsqrt(var + eps)
        a = gamma * inv
        rowm = (jnp.arange(H) < h_valid)[:, None, None]
        z0 = jnp.where(rowm, z, 0)
        if relu and _tie_from_y():
            gp = jnp.where(res[10] > 0, gy, jnp.zeros((), gy.dtype))
        elif relu:
            pre = z0 * a2[None, :, None] + b2[None, :, None]
            gp = gy * _tie(pre).astype(gy.dtype)
        else:
            gp = gy
        # per-logical-channel reductions over BOTH phase halves via the
        # free (H, 2, nch, L) reshape (single reduce ops — see _masks)
        z4 = z0.reshape(H, 2, nch, L)
        gp4 = gp.reshape(H, 2, nch, L)
        G1, G2 = _reduce2(gp4, z4, axes=(0, 1, 3), lane_axis=3)
        da = G1 - mean * G2
        dgamma = da * inv
        dinv = gamma * da
        dvar = -0.5 * (inv ** 3) * dinv
        dvar = dvar + (1 - momentum) * unbias * ct_var
        dvar = dvar * _tie(var_raw)
        dmean = -a * G2 + (1 - momentum) * ct_mean - 2.0 * mean * dvar
        ds = dmean / n
        dsq = dvar / n
        if axis_name is not None:
            ds, dsq = jax.lax.psum((ds, dsq), axis_name)
        m = _masks(L)
        if masked:
            im = jnp.repeat(item_mask, item_stride)
            m = m & im[None, :]
        dt = z.dtype
        dz4 = a.astype(dt)[None, None, :, None] * gp4 + jnp.where(
            m[None, :, None, :],
            ds.astype(dt)[None, None, :, None]
            + z4 * (2.0 * dsq).astype(dt)[None, None, :, None],
            jnp.zeros((), dt),
        )
        dz = jnp.where(rowm, dz4.reshape(H, C2, L), jnp.zeros((), dt))
        d_run_mean = momentum * ct_mean
        d_run_var = momentum * ct_var
        return dz, dgamma, G2, d_run_mean, d_run_var, None

    fn.defvjp(fwd, bwd)
    return fn


# ------------------------------------------------------------- dense lanes
def make_bn_relu_dense(h_valid: int, w_valid: int, item_stride: int,
                       momentum: float, eps: float, relu: bool = True,
                       masked: bool = False,
                       axis_name: Optional[str] = None):
    """BN+ReLU on a dense lanes tensor z (Hbuf, C, L); single lane mask
    lane < w_valid. Matches models/lanes_train._bn_relu_lanes_dense."""

    def _mask(L):
        return jnp.tile(jnp.arange(item_stride) < w_valid, L // item_stride)

    def _fwd_math(z, gamma, beta, run_mean, run_var, item_mask):
        H, C, L = z.shape
        rowm = (jnp.arange(H) < h_valid)[:, None, None]
        z0 = jnp.where(rowm, z, 0)
        m = _mask(L)
        if masked:
            im = jnp.repeat(item_mask, item_stride)
            m = m & im
            n = jnp.sum(item_mask.astype(jnp.float32)) * h_valid * w_valid
        else:
            n = jnp.float32((L // item_stride) * h_valid * w_valid)
        zm = jnp.where(m[None, None, :], z0, 0)
        s = jnp.sum(zm, axis=(0, 2), dtype=jnp.float32)
        sq = jnp.sum(jnp.square(zm), axis=(0, 2), dtype=jnp.float32)
        if axis_name is not None:
            s, sq, n = jax.lax.psum((s, sq, n), axis_name)
        mean, var_raw, var, nn, unbias, new_mean, new_var = _finish_stats(
            s, sq, n, run_mean, run_var, momentum
        )
        inv = jax.lax.rsqrt(var + eps)
        a = gamma * inv
        b = beta - mean * a
        ac, bc = a, b
        if z.dtype != jnp.float32:
            ac, bc = a.astype(z.dtype), b.astype(z.dtype)
        y = z0 * ac[None, :, None] + bc[None, :, None]
        if relu:
            y = jnp.maximum(y, 0)
        return y, new_mean, new_var, (mean, var_raw, var, nn, unbias, ac, bc)

    @jax.custom_vjp
    def fn(z, gamma, beta, run_mean, run_var, item_mask):
        y, new_mean, new_var, _ = _fwd_math(
            z, gamma, beta, run_mean, run_var, item_mask
        )
        return y, new_mean, new_var

    def fwd(z, gamma, beta, run_mean, run_var, item_mask):
        y, new_mean, new_var, res = _fwd_math(
            z, gamma, beta, run_mean, run_var, item_mask
        )
        mean, var_raw, var, n, unbias, ac, bc = res
        ytie = (y,) if relu and _tie_from_y() else ()
        return (y, new_mean, new_var), (
            z, gamma, item_mask, mean, var_raw, var, n, unbias, ac, bc,
        ) + ytie

    def bwd(res, cts):
        # bf16-native elementwise, f32-accumulating reductions (see the p2
        # variant for why)
        gy, ct_mean, ct_var = cts
        z, gamma, item_mask, mean, var_raw, var, n, unbias, ac, bc = res[:10]
        H, C, L = z.shape
        inv = jax.lax.rsqrt(var + eps)
        a = gamma * inv
        rowm = (jnp.arange(H) < h_valid)[:, None, None]
        z0 = jnp.where(rowm, z, 0)
        if relu and _tie_from_y():
            gp = jnp.where(res[10] > 0, gy, jnp.zeros((), gy.dtype))
        elif relu:
            pre = z0 * ac[None, :, None] + bc[None, :, None]
            gp = gy * _tie(pre).astype(gy.dtype)
        else:
            gp = gy
        G1, G2 = _reduce2(gp, z0, axes=(0, 2), lane_axis=2)
        da = G1 - mean * G2
        dgamma = da * inv
        dinv = gamma * da
        dvar = -0.5 * (inv ** 3) * dinv
        dvar = dvar + (1 - momentum) * unbias * ct_var
        dvar = dvar * _tie(var_raw)
        dmean = -a * G2 + (1 - momentum) * ct_mean - 2.0 * mean * dvar
        ds = dmean / n
        dsq = dvar / n
        if axis_name is not None:
            ds, dsq = jax.lax.psum((ds, dsq), axis_name)
        m = _mask(L)
        if masked:
            im = jnp.repeat(item_mask, item_stride)
            m = m & im
        dt = z.dtype
        mfull = m[None, None, :] & rowm
        dz = a.astype(dt)[None, :, None] * gp + jnp.where(
            mfull,
            ds.astype(dt)[None, :, None]
            + z0 * (2.0 * dsq).astype(dt)[None, :, None],
            jnp.zeros((), dt),
        )
        dz = jnp.where(rowm, dz, jnp.zeros((), dt))
        return (dz, dgamma, G2, momentum * ct_mean,
                momentum * ct_var, None)

    fn.defvjp(fwd, bwd)
    return fn


# -------------------------------------------------------------------- NHWC
def make_bn_relu_nhwc(momentum: float, eps: float, relu: bool = True,
                      masked: bool = False,
                      axis_name: Optional[str] = None):
    """BN+ReLU on an NHWC conv output (B, H, W, C); the only mask is the
    per-item validity mask. Matches the BN tail of
    models/lanes_train._conv_bn_relu_nhwc."""

    def _fwd_math(z, gamma, beta, run_mean, run_var, item_mask):
        B, H, W, C = z.shape
        if masked:
            wm = item_mask.astype(z.dtype)[:, None, None, None]
            zm = z * wm
            s = jnp.sum(zm, axis=(0, 1, 2), dtype=jnp.float32)
            sq = jnp.sum(jnp.square(z) * wm, axis=(0, 1, 2),
                         dtype=jnp.float32)
            n = jnp.sum(item_mask.astype(jnp.float32)) * H * W
        else:
            s = jnp.sum(z, axis=(0, 1, 2), dtype=jnp.float32)
            sq = jnp.sum(jnp.square(z), axis=(0, 1, 2), dtype=jnp.float32)
            n = jnp.float32(B * H * W)
        if axis_name is not None:
            s, sq, n = jax.lax.psum((s, sq, n), axis_name)
        mean, var_raw, var, nn, unbias, new_mean, new_var = _finish_stats(
            s, sq, n, run_mean, run_var, momentum
        )
        inv = jax.lax.rsqrt(var + eps)
        a = gamma * inv
        b = beta - mean * a
        ac, bc = a, b
        if z.dtype != jnp.float32:
            ac, bc = a.astype(z.dtype), b.astype(z.dtype)
        y = z * ac + bc
        if relu:
            y = jnp.maximum(y, 0)
        return y, new_mean, new_var, (mean, var_raw, var, nn, unbias, ac, bc)

    @jax.custom_vjp
    def fn(z, gamma, beta, run_mean, run_var, item_mask):
        y, new_mean, new_var, _ = _fwd_math(
            z, gamma, beta, run_mean, run_var, item_mask
        )
        return y, new_mean, new_var

    def fwd(z, gamma, beta, run_mean, run_var, item_mask):
        y, new_mean, new_var, res = _fwd_math(
            z, gamma, beta, run_mean, run_var, item_mask
        )
        mean, var_raw, var, n, unbias, ac, bc = res
        ytie = (y,) if relu and _tie_from_y() else ()
        return (y, new_mean, new_var), (
            z, gamma, item_mask, mean, var_raw, var, n, unbias, ac, bc,
        ) + ytie

    def bwd(res, cts):
        # bf16-native elementwise, f32-accumulating reductions (see the p2
        # variant for why)
        gy, ct_mean, ct_var = cts
        z, gamma, item_mask, mean, var_raw, var, n, unbias, ac, bc = res[:10]
        inv = jax.lax.rsqrt(var + eps)
        a = gamma * inv
        if relu and _tie_from_y():
            gp = jnp.where(res[10] > 0, gy, jnp.zeros((), gy.dtype))
        elif relu:
            pre = z * ac + bc
            gp = gy * _tie(pre).astype(gy.dtype)
        else:
            gp = gy
        if _bwd_reduce_mode() == "dots":
            # (B*H*W, C) matvec with a ones vector: the MXU contracts the
            # major dim natively (reduced axes are all major here — C, the
            # lane dim, is the one KEPT)
            C = z.shape[-1]
            ones = jnp.ones((gp.size // C,), gp.dtype)
            dn = (((0,), (0,)), ((), ()))
            G1 = jax.lax.dot_general(
                (gp * z).reshape(-1, C), ones, dn,
                preferred_element_type=jnp.float32,
            )
            G2 = jax.lax.dot_general(
                gp.reshape(-1, C), ones, dn,
                preferred_element_type=jnp.float32,
            )
        else:
            G1 = jnp.sum(gp * z, axis=(0, 1, 2), dtype=jnp.float32)
            G2 = jnp.sum(gp, axis=(0, 1, 2), dtype=jnp.float32)
        da = G1 - mean * G2
        dgamma = da * inv
        dinv = gamma * da
        dvar = -0.5 * (inv ** 3) * dinv
        dvar = dvar + (1 - momentum) * unbias * ct_var
        dvar = dvar * _tie(var_raw)
        dmean = -a * G2 + (1 - momentum) * ct_mean - 2.0 * mean * dvar
        ds = dmean / n
        dsq = dvar / n
        if axis_name is not None:
            ds, dsq = jax.lax.psum((ds, dsq), axis_name)
        dt = z.dtype
        stat = ds.astype(dt) + z * (2.0 * dsq).astype(dt)
        if masked:
            stat = stat * item_mask.astype(dt)[:, None, None, None]
        dz = a.astype(dt) * gp + stat
        return (dz, dgamma, G2, momentum * ct_mean,
                momentum * ct_var, None)

    fn.defvjp(fwd, bwd)
    return fn
