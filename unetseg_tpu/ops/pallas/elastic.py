"""Pallas TPU kernel: displaced bilinear/nearest resampling on the MXU.

The elastic-deformation hot loop (reference: utils/augmentations.py:35-37 —
map_coordinates order 1 for the image, order 0 for the mask) is a per-pixel
2D gather at runtime-computed coordinates. XLA lowers that to a generic
gather, which on TPU runs at ~35 ms per 4x512^2 batch — the slowest stage of
the whole train step. This kernel reformulates the gather as dense matmuls:

- The displacement field is *smooth* (a sigma=20 Gaussian blur), so over a
  (32, 128) output block the sampled coordinates span a bounded window of
  the source image. The host side computes each block's window origin (the
  floor of the block's min coordinate) and the kernel DMAs just that
  (2, WIN_H, WIN_W) window from HBM — img and mask channels. WIN_W is a
  multiple of 128 because TPU DMA slices on the minor (lane) dimension must
  be lane-tile aligned.
- Column (x) interpolation runs as ONE-HOT MATMUL on the MXU: weights
  Wc[c, p] = max(0, 1 - |c - rel_x[p]|) have <=2 nonzeros per pixel column,
  and win (WIN_H, WIN_W) @ Wc (WIN_W, 128) -> (WIN_H, 128). Row (y)
  interpolation is the same weight pattern applied elementwise followed by
  a sublane reduction. All layouts are natural — no in-kernel transposes.
- The nearest (mask) tap uses exact 0/1 one-hot weights, so integer labels
  are reproduced exactly.

Exactness: identical taps and weights to the XLA gather path whenever the
in-block coordinate range fits the static window (RANGE_Y/RANGE_X ~ 150/126
px vs ~84 px empirical max for the alpha=2000/sigma=20 defaults); beyond
that the coordinates clamp to the window edge — the same astronomically-
rare tail handling as ops.elastic.displacement_pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output block (sublane x lane) and static in-block displacement-range halos.
# Window origins are quantized to the pack's (8, 128) tile grid — TPU DMA
# slice offsets must be provably tile-aligned — so each window carries up to
# one extra tile of slack on each axis.
BH, BW = 32, 128
RANGE_Y = 150
WIN_H = BH + RANGE_Y + 2 + 8          # 192
WIN_W = BW + 126 + 2 + 128            # 384 (three 128-lane tiles)
PAD_Y, PAD_X = 8, 128                 # extra pack padding beyond the d halo


def _kernel(offs_ref, yy_ref, xx_ref, pack_ref, img_ref, mask_ref,
            win_ref, sem, *, dy, dx, win_h, win_w):
    b = pl.program_id(0)
    by = pl.program_id(1)
    bx = pl.program_id(2)
    ys = pl.multiple_of(offs_ref[b, by, bx, 0], 8)
    xs = pl.multiple_of(offs_ref[b, by, bx, 1], 128)
    # window DMA: (2, win_h, win_w) slice of the padded y-major pack
    dma = pltpu.make_async_copy(
        pack_ref.at[b, :, pl.ds(ys, win_h), pl.ds(xs, win_w)], win_ref, sem
    )
    dma.start()
    dma.wait()

    off_y = (dy - ys).astype(jnp.float32)
    off_x = (dx - xs).astype(jnp.float32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (win_h, BW), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (win_w, BW), 0).astype(jnp.float32)
    win_img = win_ref[0]
    win_mask = win_ref[1]

    def row(r, carry):
        ya = yy_ref[0, pl.ds(r, 1), :]
        xa = xx_ref[0, pl.ds(r, 1), :]
        ry = jnp.clip(ya + off_y, 0.0, win_h - 1.001)
        rx = jnp.clip(xa + off_x, 0.0, win_w - 1.001)
        # bilinear: |iota - rel| < 1 picks floor/ceil taps with (1-t, t)
        w_col = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - rx))   # (win_w, BW)
        tmp = jnp.dot(win_img, w_col, preferred_element_type=jnp.float32)
        w_row = jnp.maximum(0.0, 1.0 - jnp.abs(iota_h - ry))   # (win_h, BW)
        img_ref[0, pl.ds(r, 1), :] = jnp.sum(tmp * w_row, axis=0, keepdims=True)
        # nearest: exact 0/1 one-hot. Round the ABSOLUTE coordinate first and
        # add the (integer-valued) window offset after — f32 addition before
        # rounding could shift half-ties, diverging from the gather path.
        rnx = jnp.clip(jnp.round(xa) + off_x, 0.0, win_w - 1.0)
        w_coln = (iota_w == rnx).astype(jnp.float32)
        tmpn = jnp.dot(win_mask, w_coln, preferred_element_type=jnp.float32)
        rny = jnp.clip(jnp.round(ya) + off_y, 0.0, win_h - 1.0)
        w_rown = (iota_h == rny).astype(jnp.float32)
        mask_ref[0, pl.ds(r, 1), :] = jnp.sum(tmpn * w_rown, axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, BH, row, 0)


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def sample_displaced(pack: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray,
                     d: int, interpret: bool = False):
    """Sample (img bilinear, mask nearest) at absolute coordinates.

    pack:   (B, 2, Hp, Wp) f32 — reflect-padded [image, mask] with
            per-axis pads (d + PAD_Y, d + PAD_X): Hp = H + 2d + 2*PAD_Y,
            Wp = W + 2d + 2*PAD_X. The extra tile of padding absorbs the
            tile-quantization of window origins, keeping every in-range
            tap inside its window.
    yy, xx: (B, H, W) f32 absolute coordinates in the unpadded frame,
            pre-clamped to [-d, dim - 1 + d - 1.001].
    Requires H % 32 == 0 and W % 128 == 0 (the caller falls back to the
    XLA gather path otherwise).
    """
    b, h, w = yy.shape
    hp, wp = pack.shape[2], pack.shape[3]
    dy, dx = d + PAD_Y, d + PAD_X
    win_h = min(WIN_H, (hp // 8) * 8)
    win_w = min(WIN_W, (wp // 128) * 128)
    nby, nbx = h // BH, w // BW

    by_min = jnp.floor(
        yy.reshape(b, nby, BH, nbx, BW).min(axis=(2, 4))
    ).astype(jnp.int32) + dy
    bx_min = jnp.floor(
        xx.reshape(b, nby, BH, nbx, BW).min(axis=(2, 4))
    ).astype(jnp.int32) + dx
    # quantize window origins to the (8, 128) tile grid of the pack
    ys = jnp.clip((by_min // 8) * 8, 0, ((hp - win_h) // 8) * 8)
    xs = jnp.clip((bx_min // 128) * 128, 0, ((wp - win_w) // 128) * 128)
    offs = jnp.stack([ys, xs], axis=-1)  # (B, nby, nbx, 2) int32

    kernel = functools.partial(
        _kernel, dy=dy, dx=dx, win_h=win_h, win_w=win_w
    )
    blk = pl.BlockSpec(
        (1, BH, BW), lambda bb, yb, xb: (bb, yb, xb),
        memory_space=pltpu.VMEM,
    )
    img, mask = pl.pallas_call(
        kernel,
        grid=(b, nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offs
            blk,                                     # yy
            blk,                                     # xx
            pl.BlockSpec(memory_space=pltpu.ANY),    # pack (stays off-VMEM)
        ],
        out_specs=(blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(offs, yy, xx, pack)
    return img, mask
