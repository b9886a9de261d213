"""Lanes-native TRAINING forward for the hot U-Net stages.

The batch-4 512-pixel train step spends 25 ms in enc0 and 12 ms in dec3
(of ~67 ms) — mostly layout churn XLA's conv lowering forces on the
BN/ReLU/residual traffic around the convs, not conv FLOPs
(tools/profile_step.py trainstep; docs/PARITY.md). This module runs those
stages in the 2-phase lanes layout:

- convs: ops/pallas/conv3x3_train.make_conv_p2_train (custom VJP, Pallas
  forward + dx/dW kernels);
- BatchNorm: bit-matching MaskedBatchNorm semantics (one-pass fp32
  E[x^2]-E[x]^2 over item-masked pixels, torch-unbiased running update) as
  plain XLA reductions/elementwise on the lanes arrays — with no conv
  lowering nearby these stay trivially laid out;
- pool / crop / concat: major-dim slices, channel-block max, lane rolls;
- the up-path tconv: Pallas forward (tconv2x2_phase2), XLA backward via
  custom VJP (the k=2 s=2 tconv backward is a pure channel contraction in
  lanes — row interleaving is a free major-dim reshape).

The middle of the network (enc1..enc4, dec0..dec2) stays exactly the Flax
modules' math in NHWC, reimplemented functionally over the SAME parameter
tree — parity with UNet.apply(train=True) is pinned by
tests/test_lanes_train.py. reference: models/unet_model.py:105-146.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.models.shapes import unet_shapes
from unetseg_tpu.models.unet import center_crop_nhwc
from unetseg_tpu.ops.pallas.conv3x3 import (
    from_lanes,
    from_lanes_p2,
    lane_stride,
    tconv2x2_phase2,
    to_lanes,
    to_lanes_p2,
)
from unetseg_tpu.ops.pallas.conv3x3_train import make_conv_p2_train


# --------------------------------------------------------------------- BN
def _bn_stats_lanes(z, nch, h_valid, w_valid, item_mask, item_stride,
                    axis_name=None):
    """Masked one-pass fp32 batch statistics of a (Hbuf, 2*nch, L) lanes
    tensor. Returns (mean, var, n) — MaskedBatchNorm math exactly
    (models/unet.py:114-138). With `axis_name` (shard_map data-parallel
    training) the moment sums are psummed across the mesh axis first, so
    every shard normalizes with the GLOBAL batch statistics — numerically
    identical to the single-device step."""
    n_items = z.shape[2] // item_stride
    lane_ids = jnp.arange(item_stride)
    m0 = jnp.broadcast_to(
        (lane_ids < -(-w_valid // 2))[None, :], (n_items, item_stride)
    )
    m1 = jnp.broadcast_to(
        (lane_ids < w_valid // 2)[None, :], (n_items, item_stride)
    )
    im = item_mask[:, None] if item_mask is not None else jnp.ones(
        (n_items, 1), bool
    )
    w0 = (m0 & im).reshape(-1)
    w1 = (m1 & im).reshape(-1)
    zv = z[:h_valid]
    z0 = jnp.where(w0[None, None, :], zv[:, :nch], 0)
    z1 = jnp.where(w1[None, None, :], zv[:, nch:], 0)
    s = jnp.sum(z0, axis=(0, 2), dtype=jnp.float32) + jnp.sum(
        z1, axis=(0, 2), dtype=jnp.float32
    )
    sq = jnp.sum(jnp.square(z0), axis=(0, 2), dtype=jnp.float32) + jnp.sum(
        jnp.square(z1), axis=(0, 2), dtype=jnp.float32
    )
    if item_mask is None:
        n = jnp.float32(n_items * h_valid * w_valid)
    else:
        n = jnp.sum(item_mask.astype(jnp.float32)) * h_valid * w_valid
    if axis_name is not None:
        s, sq, n = jax.lax.psum((s, sq, n), axis_name)
    n = jnp.maximum(n, 1.0)
    mean = s / n
    var = jnp.maximum(sq / n - jnp.square(mean), 0.0)
    return mean, var, n


def _use_fused_dec0() -> bool:
    """Fused decoder-entry conv for the TRAIN dec3 block (custom-VJP
    dec_conv0_phase2 + conv3x3_dec0_dw): the skip center-crop folds into
    DMA offsets + lane rolls instead of a full-tensor jnp.roll + concat.
    Parity pinned by tests/test_conv3x3_train.py and test_lanes_train.py.
    UNETSEG_DEC0_FUSED=0 restores the roll+concat composition (A/B)."""
    import os

    return os.environ.get("UNETSEG_DEC0_FUSED", "1") == "1"


def _use_fused_bn() -> bool:
    """Fused custom-VJP BN+ReLU (ops/fused_bn.py) — collapses the BN
    statistics/backward to the minimum pass count (~14 ms of loop-fusion
    traffic in the 46 ms no-aug step: two 6.27 ms reduce_sums + 1.8 ms
    select_n). DEFAULT ON since the on-chip interleaved A/B
    (tools/fused_bn_ab.py): no-aug 41.41 vs 46.23 ms/step, augmented
    45.79 vs 50.22. Two earlier formulations lost — f32-materializing
    backward (48.8) and slice-wise phase reductions that blocked XLA's
    multi-output reduction fusion; the winning form reduces over a free
    (H, 2, nch, L) reshape. UNETSEG_FUSED_BN=0 restores the autodiff'd
    composition."""
    import os

    return os.environ.get("UNETSEG_FUSED_BN", "1") == "1"


def _bn_relu_lanes(z, p_bn, stats, h_valid, w_valid, item_mask, item_stride,
                   momentum, eps, relu=True, axis_name=None):
    """BN (training stats) + ReLU on a lanes tensor; returns the activation
    and the updated running stats {mean, var}."""
    nch = p_bn["scale"].shape[0]
    if _use_fused_bn():
        from unetseg_tpu.ops.fused_bn import make_bn_relu_p2

        fn = make_bn_relu_p2(
            nch, h_valid, w_valid, item_stride, momentum, eps, relu=relu,
            masked=item_mask is not None, axis_name=axis_name,
        )
        im = (item_mask if item_mask is not None
              else jnp.ones((z.shape[2] // item_stride,), bool))
        y, nm, nv = fn(
            z, p_bn["scale"], p_bn["bias"], stats["mean"], stats["var"], im
        )
        return y, {"mean": nm, "var": nv}
    # rows past h_valid can be uninitialized memory (raw-rows spare blocks);
    # zero them with a where so NaN can't leak into the scale/mean/var
    # gradients through the full-buffer normalize below (NaN * 0 == NaN)
    z = jnp.where((jnp.arange(z.shape[0]) < h_valid)[:, None, None], z, 0)
    mean, var, n = _bn_stats_lanes(
        z, nch, h_valid, w_valid, item_mask, item_stride, axis_name
    )
    unbias = n / jnp.maximum(n - 1.0, 1.0)
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var * unbias,
    }
    inv = jax.lax.rsqrt(var + eps)
    a = p_bn["scale"] * inv
    b = p_bn["bias"] - mean * a
    a2 = jnp.concatenate([a, a])
    b2 = jnp.concatenate([b, b])
    if z.dtype != jnp.float32:
        a2, b2 = a2.astype(z.dtype), b2.astype(z.dtype)
    y = z * a2[None, :, None] + b2[None, :, None]
    if relu:
        y = jnp.maximum(y, 0)
    return y, new_stats


def _pool_lanes_p2(x, nch, h_valid):
    """2x2 max pool of a 2-phase lanes tensor -> dense 1-phase (rows halve
    via major-dim strided slices, columns via the phase-pair max; pooled
    column j IS lane j)."""
    hp = (h_valid - 0) // 2
    a = x[0 : 2 * hp : 2]
    b = x[1 : 2 * hp : 2]
    m = jnp.maximum(a, b)
    return jnp.maximum(m[:, :nch], m[:, nch:])


def _bn_stats_lanes_dense(z, h_valid, w_valid, item_mask, item_stride,
                          axis_name=None):
    """Masked one-pass fp32 batch statistics of a DENSE (Hbuf, C, L) lanes
    tensor (single lane mask: lane < w_valid)."""
    n_items = z.shape[2] // item_stride
    m = jnp.broadcast_to(
        jnp.tile(jnp.arange(item_stride) < w_valid, n_items)[None, :],
        (z.shape[1], z.shape[2]),
    )
    if item_mask is not None:
        im = jnp.repeat(item_mask, item_stride)
        m = m & im[None, :]
    zm = jnp.where(m[None], z, 0)[:h_valid]
    s = jnp.sum(zm, axis=(0, 2), dtype=jnp.float32)
    sq = jnp.sum(jnp.square(zm), axis=(0, 2), dtype=jnp.float32)
    if item_mask is None:
        n = jnp.float32(n_items * h_valid * w_valid)
    else:
        n = jnp.sum(item_mask.astype(jnp.float32)) * h_valid * w_valid
    if axis_name is not None:
        s, sq, n = jax.lax.psum((s, sq, n), axis_name)
    n = jnp.maximum(n, 1.0)
    mean = s / n
    var = jnp.maximum(sq / n - jnp.square(mean), 0.0)
    return mean, var, n


def _bn_relu_lanes_dense(z, p_bn, stats, h_valid, w_valid, item_mask,
                         item_stride, momentum, eps, relu=True,
                         axis_name=None):
    """BN (training stats) + ReLU on a DENSE lanes tensor."""
    if _use_fused_bn():
        from unetseg_tpu.ops.fused_bn import make_bn_relu_dense

        fn = make_bn_relu_dense(
            h_valid, w_valid, item_stride, momentum, eps, relu=relu,
            masked=item_mask is not None, axis_name=axis_name,
        )
        im = (item_mask if item_mask is not None
              else jnp.ones((z.shape[2] // item_stride,), bool))
        y, nm, nv = fn(
            z, p_bn["scale"], p_bn["bias"], stats["mean"], stats["var"], im
        )
        return y, {"mean": nm, "var": nv}
    # zero garbage tail rows FIRST (raw-rows buffers may hold NaN)
    z = jnp.where((jnp.arange(z.shape[0]) < h_valid)[:, None, None], z, 0)
    mean, var, n = _bn_stats_lanes_dense(
        z, h_valid, w_valid, item_mask, item_stride, axis_name
    )
    unbias = n / jnp.maximum(n - 1.0, 1.0)
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var * unbias,
    }
    inv = jax.lax.rsqrt(var + eps)
    a = p_bn["scale"] * inv
    b = p_bn["bias"] - mean * a
    if z.dtype != jnp.float32:
        a, b = a.astype(z.dtype), b.astype(z.dtype)
    y = z * a[None, :, None] + b[None, :, None]
    if relu:
        y = jnp.maximum(y, 0)
    return y, new_stats


def _pool_dense_to_nhwc(x, b, h_valid, w_valid):
    """2x2 max pool of a dense (H, C, B*stride) lanes tensor, handed off to
    NHWC: rows halve via strided slices in lanes, the tensor transposes to
    NHWC (the consumer is the NHWC middle anyway), and columns halve via a
    reduce_window there. Replaces a lane roll-max whose transpose
    (concat + add_any in the backward) cost ~1.5 ms/step and could not fuse
    across the surrounding pallas_call boundaries."""
    hp = h_valid // 2
    a = jnp.maximum(x[0 : 2 * hp : 2], x[1 : 2 * hp : 2])
    h, c, bl = a.shape
    stride = bl // b
    nhwc = a.reshape(h, c, b, stride)[:, :, :, :w_valid].transpose(2, 0, 3, 1)
    return jax.lax.reduce_window(
        nhwc, -jnp.inf, jax.lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID"
    )


# ------------------------------------------------------------------ tconv
def make_tconv_p2_train(item_stride: int, interpret: bool = False):
    """Training k=2 s=2 tconv: Pallas forward (dense 1-phase in, 2-phase
    out), XLA backward — in lanes both gradients are pure channel
    contractions (row interleave is a free major-dim reshape)."""

    @jax.custom_vjp
    def tconv(x, w, b):
        return tconv2x2_phase2(
            x, w, b.reshape(-1, 1), item_stride, interpret=interpret,
            raw_rows=True,
        )

    def fwd(x, w, b):
        return tconv(x, w, b), (x, w)

    def bwd(res, g):
        x, w = res
        ci, co = w.shape[2], w.shape[3]
        h = x.shape[0]
        # g buffer: rows (2*nby*th_in + spare); use the 2*h valid rows.
        # Wf[dy,dx,ci,co] = w[1-dy,1-dx] (flax flip, see pack_w_tconv):
        # out[2r+dy, phase dx] = Wf[dy,dx] . x[r] -> fold (dy, dx, co) into
        # one contraction axis of size 4*co via a major-dim reshape of g.
        gv = g[: 2 * h]
        g4 = gv.reshape(h, 2, 2 * co, gv.shape[2]).reshape(
            h, 4 * co, gv.shape[2]
        )
        wf = w[::-1, ::-1]  # (dy, dx, ci, co) as applied
        wm = wf.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
        dx = jax.lax.dot_general(
            wm, g4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ci, h, L)
        dx = jnp.moveaxis(dx, 0, 1).astype(x.dtype)
        # dW: contract over rows and lanes; garbage lanes/rows of g must
        # already be zeroed by the caller-side mask in the block assembly
        dwm = jax.lax.dot_general(
            x, g4, (((0, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ci, 4*co)
        dwf = dwm.reshape(ci, 2, 2, co).transpose(1, 2, 0, 3)
        dw = dwf[::-1, ::-1]
        db4 = jnp.sum(g4, axis=(0, 2), dtype=jnp.float32).reshape(2, 2, co)
        db = jnp.sum(db4, axis=(0, 1))
        return dx, dw.astype(w.dtype), db.astype(jnp.float32)

    tconv.defvjp(fwd, bwd)
    return tconv


# --------------------------------------------------------- NHWC middle ops
def _conv_bn_relu_nhwc(x, p_conv, p_bn, stats, item_mask, momentum, eps,
                       dtype, axis_name=None):
    bias = p_conv["bias"]
    if os.environ.get("UNETSEG_BIAS_SG", "1") == "1":
        # A pre-BN conv bias has EXACTLY zero gradient (BN's mean
        # subtraction removes any constant shift), but autodiff still pays
        # a full activation-sized reduce per conv to compute the
        # float-noise zeros — and Adam then random-walks the inert
        # parameter on that noise. stop_gradient deletes the reductions
        # (aug step 43.57 -> 43.14 ms interleaved A/B) and pins the bias;
        # the network function is identical either way. UNETSEG_BIAS_SG=0
        # restores autodiff-faithful noise grads.
        bias = jax.lax.stop_gradient(bias)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p_conv["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    ) + bias.astype(dtype)
    if _use_fused_bn():
        from unetseg_tpu.ops.fused_bn import make_bn_relu_nhwc

        fn = make_bn_relu_nhwc(
            momentum, eps, masked=item_mask is not None,
            axis_name=axis_name,
        )
        im = (item_mask if item_mask is not None
              else jnp.ones((y.shape[0],), bool))
        a, nm, nv = fn(
            y, p_bn["scale"], p_bn["bias"], stats["mean"], stats["var"], im
        )
        return a, {"mean": nm, "var": nv}
    if item_mask is None:
        s = jnp.sum(y, axis=(0, 1, 2), dtype=jnp.float32)
        sq = jnp.sum(jnp.square(y), axis=(0, 1, 2), dtype=jnp.float32)
        n = jnp.float32(y.shape[0] * y.shape[1] * y.shape[2])
    else:
        wm = item_mask.astype(y.dtype)[:, None, None, None]
        n = (
            jnp.sum(item_mask.astype(jnp.float32)) * y.shape[1] * y.shape[2]
        )
        s = jnp.sum(y * wm, axis=(0, 1, 2), dtype=jnp.float32)
        sq = jnp.sum(jnp.square(y) * wm, axis=(0, 1, 2), dtype=jnp.float32)
    if axis_name is not None:
        s, sq, n = jax.lax.psum((s, sq, n), axis_name)
    n = jnp.maximum(n, 1.0)
    mean = s / n
    mean_sq = sq / n
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    unbias = n / jnp.maximum(n - 1.0, 1.0)
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var * unbias,
    }
    inv = jax.lax.rsqrt(var + eps)
    a = p_bn["scale"] * inv
    b = p_bn["bias"] - mean * a
    if y.dtype != jnp.float32:
        a, b = a.astype(y.dtype), b.astype(y.dtype)
    return jnp.maximum(y * a + b, 0), new_stats


def _block_nhwc(x, p, st, item_mask, momentum, eps, dtype, axis_name=None):
    new_st = {}
    for i in range(2):
        x, new_st[f"bn{i}"] = _conv_bn_relu_nhwc(
            x, p[f"conv{i}"], p[f"bn{i}"], st[f"bn{i}"], item_mask,
            momentum, eps, dtype, axis_name,
        )
    return x, new_st


# ----------------------------------------------------------- full forward
def train_forward_lanes(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    x: jnp.ndarray,
    model_cfg: ModelConfig,
    item_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    axis_name: Optional[str] = None,
    tier2: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Training forward == UNet.apply(train=True, mutable=['batch_stats'])
    with enc0 and up3/dec3 in the 2-phase lanes layout.

    x: (B, S, S, 1); returns (logits f32, new_batch_stats). Inside a
    shard_map over a data-parallel mesh axis, pass `axis_name` so the batch
    statistics are psummed to global — see parallel/sharding.py.

    tier2 (None = opt-in via the UNETSEG_LANES_TIER2_TRAIN env, gated by
    infer.lanes_net.supports_tier2) extends the lanes region one level
    deeper: enc1 and dec2 run as DENSE-layout custom-VJP Pallas convs
    (ops/pallas/conv3x3_train.make_conv_dense_train) directly on enc0's
    pooled lanes tensor, with the enc1->enc2 pool as a lanes roll-max and
    the dec2 skip crop as a lane roll + row slice. OFF by default: measured
    on the v5e it is ~3.7 ms/step SLOWER than tier 1 (49.9 vs 46.2 no-aug)
    — the full-tensor jnp.roll glue and its transpose (~3.5 ms of concat/
    add_any that cannot fuse across the pallas_call boundaries) eat the
    conv win. The fix, if revisited, is folding the pool/crop rolls into
    the dense kernels' epilogue/prologue (pltpu.roll on the f32 output)."""
    cfg = model_cfg
    dtype = jnp.dtype(cfg.compute_dtype)
    mom, eps = cfg.bn_momentum, cfg.bn_epsilon
    b, s = x.shape[0], x.shape[1]
    sh = unet_shapes(s, cfg.levels)
    f0 = cfg.base_features
    st0 = lane_stride(-(-s // 2))
    new_stats: Dict[str, Any] = {}

    # ---- enc0 in lanes ----
    need0 = (-(-(s - 2) // 8) - 1) * 8 + 10
    xp = x.astype(dtype)
    if need0 > s:
        xp = jnp.pad(xp, ((0, 0), (0, need0 - s), (0, 0), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 3)))
    k0 = jnp.pad(params["enc0"]["conv0"]["kernel"], ((0, 0), (0, 0), (0, 3), (0, 0)))
    xl = to_lanes_p2(xp)
    conv0 = make_conv_p2_train(st0, s, interpret=interpret)
    z0 = conv0(xl, k0, params["enc0"]["conv0"]["bias"])
    h0, bn0 = _bn_relu_lanes(
        z0, params["enc0"]["bn0"], batch_stats["enc0"]["bn0"],
        s - 2, s - 2, item_mask, st0, mom, eps,
        axis_name=axis_name,
    )
    conv1 = make_conv_p2_train(st0, s - 2, interpret=interpret)
    z1 = conv1(h0, params["enc0"]["conv1"]["kernel"], params["enc0"]["conv1"]["bias"])
    skip0, bn1 = _bn_relu_lanes(
        z1, params["enc0"]["bn1"], batch_stats["enc0"]["bn1"],
        s - 4, s - 4, item_mask, st0, mom, eps,
        axis_name=axis_name,
    )
    new_stats["enc0"] = {"bn0": bn0, "bn1": bn1}
    pooled = _pool_lanes_p2(skip0, f0, s - 4)
    wp0 = (s - 4) // 2

    if tier2 is None:
        import os

        from unetseg_tpu.infer.lanes_net import supports_tier2

        tier2 = (
            os.environ.get("UNETSEG_LANES_TIER2_TRAIN", "0") == "1"
            and supports_tier2(cfg, s)
        )

    # ---- enc1 (tier 2): dense lanes on the pooled tensor ----
    skip1_l = None
    if tier2:
        from unetseg_tpu.ops.pallas.conv3x3_train import make_conv_dense_train

        conv10 = make_conv_dense_train(st0, wp0, interpret=interpret)
        z10 = conv10(
            pooled, params["enc1"]["conv0"]["kernel"],
            params["enc1"]["conv0"]["bias"],
        )
        h10, bn10 = _bn_relu_lanes_dense(
            z10, params["enc1"]["bn0"], batch_stats["enc1"]["bn0"],
            wp0 - 2, wp0 - 2, item_mask, st0, mom, eps, axis_name=axis_name,
        )
        conv11 = make_conv_dense_train(st0, wp0 - 2, interpret=interpret)
        z11 = conv11(
            h10, params["enc1"]["conv1"]["kernel"],
            params["enc1"]["conv1"]["bias"],
        )
        skip1_l, bn11 = _bn_relu_lanes_dense(
            z11, params["enc1"]["bn1"], batch_stats["enc1"]["bn1"],
            wp0 - 4, wp0 - 4, item_mask, st0, mom, eps, axis_name=axis_name,
        )
        new_stats["enc1"] = {"bn0": bn10, "bn1": bn11}
        xm = _pool_dense_to_nhwc(skip1_l, b, wp0 - 4, wp0 - 4)
        start_lvl = 2
    else:
        xm = from_lanes(pooled[:wp0], b, wp0)
        start_lvl = 1

    # ---- NHWC middle: enc1..enc4, dec0..dec2 (enc2.., dec0..dec1 tier2) --
    skips = []
    for lvl in range(start_lvl, cfg.levels):
        if lvl > start_lvl:
            xm = jax.lax.reduce_window(
                xm, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        xm, st = _block_nhwc(
            xm, params[f"enc{lvl}"], batch_stats[f"enc{lvl}"], item_mask,
            mom, eps, dtype, axis_name,
        )
        new_stats[f"enc{lvl}"] = st
        skips.append(xm)

    xm = skips[-1]
    for i in range(cfg.levels - (3 if tier2 else 2)):
        pu = params[f"up{i}_tconv"]
        xm = jax.lax.conv_transpose(
            xm, pu["kernel"].astype(dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pu["bias"].astype(dtype)
        skip = skips[-(i + 2)]
        skip_c = center_crop_nhwc(skip, xm.shape[1], xm.shape[2])
        xm = jnp.concatenate([skip_c, xm.astype(dtype)], axis=-1)
        xm, st = _block_nhwc(
            xm, params[f"dec{i}"], batch_stats[f"dec{i}"], item_mask,
            mom, eps, dtype, axis_name,
        )
        new_stats[f"dec{i}"] = st

    # ---- dec2 (tier 2): dense lanes ----
    dlast = cfg.levels - 2
    up_w = sh.crops[-1]
    if tier2:
        d2 = cfg.levels - 3
        pu2 = params[f"up{d2}_tconv"]
        up2 = jax.lax.conv_transpose(
            xm, pu2["kernel"].astype(dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pu2["bias"].astype(dtype)
        u2w = up2.shape[2]  # == sh.crops[-2]
        # +2 spare rows so the concat matches the crop's window slack
        up2 = jnp.pad(
            up2, ((0, 0), (0, 2), (0, max(0, st0 - u2w)), (0, 0))
        )
        ul = up2.transpose(1, 3, 0, 2).reshape(
            u2w + 2, up2.shape[3], b * st0
        )
        off2 = (wp0 - 4 - u2w) // 2
        if _use_fused_dec0():
            # fused dense decoder entry: the skip1 crop folds into the
            # kernels' DMA offsets + lane rolls (fwd dec_conv0_lanes, bwd
            # conv3x3_dec0_dense_dw) — the full-tensor roll + concat this
            # replaces was the measured reason tier-2 lost to tier-1
            # (docs/ROADMAP.md #14)
            from unetseg_tpu.ops.pallas.conv3x3_train import (
                make_dec0_dense_train,
            )

            dec20 = make_dec0_dense_train(
                st0, u2w, row_off=off2, lane_off=off2,
                skip_rows_valid=wp0 - 4, up_rows_valid=u2w,
                interpret=interpret,
            )
            zd20 = dec20(
                skip1_l, ul.astype(skip1_l.dtype),
                params[f"dec{d2}"]["conv0"]["kernel"],
                params[f"dec{d2}"]["conv0"]["bias"],
            )
        else:
            # crop skip1 to the up geometry: lane roll + row slice (skip1's
            # garbage rows are already zeroed by the BN; its garbage lanes
            # are finite and excluded by the conv's backward masks)
            crop1 = jnp.roll(skip1_l, -off2, axis=2)[off2 : off2 + u2w + 2]
            cat2 = jnp.concatenate([crop1, ul.astype(crop1.dtype)], axis=1)
            convd20 = make_conv_dense_train(st0, u2w, interpret=interpret)
            zd20 = convd20(
                cat2, params[f"dec{d2}"]["conv0"]["kernel"],
                params[f"dec{d2}"]["conv0"]["bias"],
            )
        hd20, bnd20 = _bn_relu_lanes_dense(
            zd20, params[f"dec{d2}"]["bn0"], batch_stats[f"dec{d2}"]["bn0"],
            u2w - 2, u2w - 2, item_mask, st0, mom, eps, axis_name=axis_name,
        )
        convd21 = make_conv_dense_train(st0, u2w - 2, interpret=interpret)
        zd21 = convd21(
            hd20, params[f"dec{d2}"]["conv1"]["kernel"],
            params[f"dec{d2}"]["conv1"]["bias"],
        )
        hd21, bnd21 = _bn_relu_lanes_dense(
            zd21, params[f"dec{d2}"]["bn1"], batch_stats[f"dec{d2}"]["bn1"],
            u2w - 4, u2w - 4, item_mask, st0, mom, eps, axis_name=axis_name,
        )
        new_stats[f"dec{d2}"] = {"bn0": bnd20, "bn1": bnd21}
        # up3's tconv input: already a dense lanes tensor at st0; slice the
        # valid rows (the tconv and its XLA backward use the full buffer)
        tl = hd21[: u2w - 4]
    else:
        d2w = xm.shape[2]
        if lane_stride(d2w) != st0:
            xm = jnp.pad(xm, ((0, 0), (0, 0), (0, st0 - d2w), (0, 0)))
            tl = xm.transpose(1, 3, 0, 2).reshape(
                xm.shape[1], xm.shape[3], b * st0
            )
        else:
            tl = to_lanes(xm)

    # ---- up3 + dec3 in lanes ----
    pu = params[f"up{dlast}_tconv"]
    tconv = make_tconv_p2_train(st0, interpret=interpret)
    up_l = tconv(tl, pu["kernel"].astype(dtype), pu["bias"].astype(dtype))

    row_off = (sh.encoder[0] - up_w) // 2
    if _use_fused_dec0():
        # fused decoder entry: the skip's center crop folds into the
        # kernels' DMA row offsets + lane rolls (fwd dec_conv0_phase2, bwd
        # conv3x3_dec0_dw) — neither the crop nor the concat is ever
        # materialized. The XLA composition below rolled the FULL 133 MB
        # skip0 tensor and wrote a 173 MB concat every step.
        from unetseg_tpu.ops.pallas.conv3x3_train import make_dec0_p2_train

        dec0 = make_dec0_p2_train(
            st0, up_w, row_off, row_off // 2,
            skip_rows_valid=sh.encoder[0], interpret=interpret,
        )
        zd0 = dec0(
            skip0, up_l, params[f"dec{dlast}"]["conv0"]["kernel"],
            params[f"dec{dlast}"]["conv0"]["bias"],
        )
    else:
        # crop skip0 to the up geometry: static row slice + phase-preserving
        # lane roll (even column offsets only — supports() guards)
        crop = jnp.roll(
            skip0, -(row_off // 2), axis=2
        )[row_off : row_off + up_w + 2]
        # mask the up buffer's garbage (rows beyond up_w, dead tail lanes)
        # so the concat-conv's dW contraction can't see uninitialized
        # memory; the crop is real data everywhere it is read
        upv = up_l[: up_w + 2]  # keep one spare pair of rows for the window
        cat = jnp.concatenate(
            [crop[:, :f0], upv[:, :f0], crop[:, f0:], upv[:, f0:]], axis=1
        )
        convd0 = make_conv_p2_train(st0, up_w, interpret=interpret)
        zd0 = convd0(
            cat, params[f"dec{dlast}"]["conv0"]["kernel"],
            params[f"dec{dlast}"]["conv0"]["bias"],
        )
    hd0, bnd0 = _bn_relu_lanes(
        zd0, params[f"dec{dlast}"]["bn0"], batch_stats[f"dec{dlast}"]["bn0"],
        up_w - 2, up_w - 2, item_mask, st0, mom, eps,
        axis_name=axis_name,
    )
    convd1 = make_conv_p2_train(st0, up_w - 2, interpret=interpret)
    zd1 = convd1(
        hd0, params[f"dec{dlast}"]["conv1"]["kernel"],
        params[f"dec{dlast}"]["conv1"]["bias"],
    )
    hd1, bnd1 = _bn_relu_lanes(
        zd1, params[f"dec{dlast}"]["bn1"], batch_stats[f"dec{dlast}"]["bn1"],
        up_w - 4, up_w - 4, item_mask, st0, mom, eps,
        axis_name=axis_name,
    )
    new_stats[f"dec{dlast}"] = {"bn0": bnd0, "bn1": bnd1}

    # ---- 1x1 head (f32 like the training model) ----
    ko = params["outc"]["kernel"].reshape(f0, cfg.num_classes)
    bo = params["outc"]["bias"]
    logits = []
    for p in range(2):
        yp = hd1[:, p * f0 : (p + 1) * f0, :].astype(jnp.float32)
        lp = jax.lax.dot_general(
            ko.T, yp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits.append(jnp.moveaxis(lp, 0, 1))
    ll = jnp.concatenate(logits, axis=1)[: sh.output_size]
    ll = ll + jnp.tile(bo, 2)[None, :, None]
    return from_lanes_p2(ll, b, sh.output_size).astype(jnp.float32), new_stats
