"""Pallas TPU fused 3x3 VALID convolution for low-channel stages.

XLA's TPU lowering of the U-Net's C=64 convolutions at large spatial sizes
spends most of its time on layout churn: an isolated enc0b-shape conv
(4x510^2, 64->64) profiles at 4.6 ms, of which ~2.5 ms is data
formatting/padding and only ~1 ms the convolution itself — 11x off the
~0.4 ms bf16 roofline. This kernel computes the conv in a churn-free
layout with ONE MXU dot per output row (measured 1.76 ms on the same
shape, 2.6x):

- activations live as (H, C, B*Wp): rows major, channels on SUBLANES,
  batch x padded-width on LANES (each item's width padded to a 128-lane
  multiple so item boundaries stay lane-tile aligned). Three consecutive
  rows of the VMEM window stack along sublanes into the (3*CI, lanes)
  contraction operand — a layout-trivial reshape;
- the 3 kernel-column taps ride the M axis: W_all is (3*CO, 3*CI) with
  W_all[CO*kx + co, CI*ky + ci] = w[ky, kx, ci, co], so a single
  (3*CO, 3*CI) @ (3*CI, lanes) dot yields all three column-shifted partial
  sums; two f32 lane-rolls and two adds combine them (the kx shift
  commutes with the contraction; rolls wrap garbage only into each item's
  last two columns, which VALID conv discards);
- BatchNorm affine (scale, bias) and ReLU fuse into the epilogue, so a
  whole folded-BN inference layer is one kernel;
- the lane axis is blocked in item-aligned chunks (<= 2048 lanes) to bound
  VMEM for large frame batches.

reference: models/unet_model.py:5-21 (DoubleConv) is the op this serves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8           # output rows per grid step
WIN = TH + 2     # input rows per window
MAX_LANES = 2048  # lane-block cap (VMEM budget)


def _kernel(x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
            *, relu, lb, ci, co):
    by = pl.program_id(0)
    bl = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(by * TH, WIN), :, pl.ds(bl * lb, lb)], win_ref, sem
    )
    dma.start()
    dma.wait()

    for r in range(TH):
        # (3, CI, LB) -> (3*CI, LB): consecutive window rows are contiguous
        x3 = win_ref[r : r + 3].reshape(3 * ci, lb)
        y = jnp.dot(w_ref[:], x3, preferred_element_type=jnp.float32)
        acc = (
            y[0 * co : 1 * co]
            + pltpu.roll(y[1 * co : 2 * co], lb - 1, 1)
            + pltpu.roll(y[2 * co : 3 * co], lb - 2, 1)
        )
        acc = acc * s_ref[:] + b_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[r] = acc.astype(out_ref.dtype)


def _kernel_v2(x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
               *, relu, lb, ci, co, rows, nby, nbl):
    """Pipelined variant: double-buffered window DMA across grid steps and
    `rows` output rows per MXU dot.

    Per-row dots at CI=CO=64 are (192, 192, lanes) — 1.5x1.5 MXU tiles, 56%
    array utilization, and enough of them that fixed per-dot cost dominates
    (measured 44 TF/s). Stacking `rows` consecutive output rows into one
    block-banded dot pads M,K to exact tile multiples: rows=2 at CI=64 gives
    a (384, 256, lanes) dot — 100% tile utilization at 4/3 extra FLOPs (the
    off-band zeros), a strictly better trade. CI>=128 keeps rows=1 (M=K=3*CI
    are already exact tile multiples). The window DMA for grid step i+1 is
    issued before step i's compute so HBM reads hide behind the dots."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma(slot, stp):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds((stp // nbl) * TH, WIN), :,
                     pl.ds((stp % nbl) * lb, lb)],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    @pl.when(step + 1 < nby * nbl)
    def _():
        dma((step + 1) % 2, step + 1).start()

    dma(step % 2, step).wait()
    win = win_ref.at[step % 2]

    for r in range(0, TH, rows):
        xw = win[r : r + rows + 2].reshape((rows + 2) * ci, lb)
        y = jnp.dot(w_ref[:], xw, preferred_element_type=jnp.float32)
        for p in range(rows):
            seg = y[p * 3 * co : (p + 1) * 3 * co]
            acc = (
                seg[0 * co : 1 * co]
                + pltpu.roll(seg[1 * co : 2 * co], lb - 1, 1)
                + pltpu.roll(seg[2 * co : 3 * co], lb - 2, 1)
            )
            acc = acc * s_ref[:] + b_ref[:]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[r + p] = acc.astype(out_ref.dtype)


def _lane_block(total_lanes: int, item_stride: int) -> int:
    """Largest item-aligned lane block <= MAX_LANES that divides the total."""
    n_items = total_lanes // item_stride
    ipb = max(1, min(n_items, MAX_LANES // item_stride))
    while n_items % ipb:
        ipb -= 1
    return item_stride * ipb


def _rows_per_dot(ci: int) -> int:
    """Output rows per MXU dot. Measured on v5e: rows=2 (block-banded dot
    with exact M,K tiles) LOSES to rows=1 even at CI=64 where the per-row
    dot is 1.5x1.5 tiles (1.56 vs 1.39 ms on the enc0b shape) — the win in
    v2 is the double-buffered DMA, not dot shape. Keep rows=1."""
    del ci
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "relu", "interpret", "rows", "pipelined"),
)
def conv3x3_lanes(x, w_hwio, scale, bias, item_stride: int,
                  relu: bool = True, interpret: bool = False,
                  rows: int = 0, pipelined: bool = True):
    """Fused 3x3 VALID conv + affine + ReLU in the lanes layout.

    x:           (H, CI, L) bf16/f32, L = B * item_stride with item_stride a
                 multiple of 128 (see to_lanes). CI must be a sublane
                 multiple (8) — see double_conv_lanes for the stem pad.
    w_hwio:      (3, 3, CI, CO) conv kernel (packed internally).
    scale, bias: (CO, 1) f32 epilogue affine.
    rows:        output rows per dot (0 = auto); pipelined selects the
                 double-buffered-DMA kernel.
    Returns (H-2 rounded up to TH, CO, L); the caller slices [:H-2] and
    keeps only each item's first W-2 columns.
    """
    h, ci, lanes = x.shape
    co = w_hwio.shape[3]
    rows = rows or _rows_per_dot(ci)
    ho = h - 2
    nby = -(-ho // TH)
    h_pad = (nby - 1) * TH + WIN
    if h_pad > h:
        x = jnp.pad(x, ((0, h_pad - h), (0, 0), (0, 0)))
    lb = _lane_block(lanes, item_stride)
    nbl = lanes // lb

    if pipelined:
        w_all = pack_w_banded(w_hwio.astype(x.dtype), rows)
        kernel = functools.partial(
            _kernel_v2, relu=relu, lb=lb, ci=ci, co=co,
            rows=rows, nby=nby, nbl=nbl,
        )
        scratch = [
            pltpu.VMEM((2, WIN, ci, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        w_all = pack_w_all(w_hwio.astype(x.dtype))
        kernel = functools.partial(_kernel, relu=relu, lb=lb, ci=ci, co=co)
        scratch = [
            pltpu.VMEM((WIN, ci, lb), x.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_all
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        ],
        out_specs=pl.BlockSpec(
            (TH, co, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nby * TH, co, lanes), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w_all, scale, bias)
    return out[:ho]


def lane_stride(w: int) -> int:
    """Per-item lane stride: width padded to a 128-lane multiple."""
    return -(-w // 128) * 128


def to_lanes(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (H, C, B*lane_stride(W)), zero-padding each item's
    width so item boundaries are lane-tile aligned."""
    b, h, w, c = x_nhwc.shape
    wp = lane_stride(w)
    if wp > w:
        x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    return x_nhwc.transpose(1, 3, 0, 2).reshape(h, c, b * wp)


def from_lanes(x_l: jnp.ndarray, b: int, w_valid: int) -> jnp.ndarray:
    """(H, C, B*Wp) -> (B, H, w_valid, C)."""
    h, c, bw = x_l.shape
    return x_l.reshape(h, c, b, bw // b)[:, :, :, :w_valid].transpose(2, 0, 3, 1)


def pack_w_all(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, CI, CO) -> (3*CO, 3*CI) with the (kx-major, ky-major) tap
    layout conv3x3_lanes expects."""
    ci, co = w_hwio.shape[2], w_hwio.shape[3]
    return w_hwio.transpose(1, 3, 0, 2).reshape(3 * co, 3 * ci)


def pack_w_banded(w_hwio: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(3, 3, CI, CO) -> block-banded (rows*3*CO, (rows+2)*CI) so one dot
    yields `rows` consecutive output rows: row-offset p's taps sit at window
    rows p..p+2 (W[p*3CO + kx*CO + co, (p+ky)*CI + ci] = w[ky, kx, ci, co]).
    rows=1 degenerates to pack_w_all."""
    ci, co = w_hwio.shape[2], w_hwio.shape[3]
    a = w_hwio.transpose(1, 3, 0, 2)  # (kx, co, ky, ci)
    wb = jnp.zeros((rows, 3, co, rows + 2, ci), w_hwio.dtype)
    for p in range(rows):
        wb = wb.at[p, :, :, p : p + 3, :].set(a)
    return wb.reshape(rows * 3 * co, (rows + 2) * ci)


def double_conv_lanes(x_nhwc, k0, b0, k1, b1, relu=True, interpret=False):
    """Two fused (3x3 VALID conv + bias + ReLU) stages with ONE layout
    round-trip: NHWC -> lanes -> conv -> conv -> NHWC. Each conv leaves 2
    stale columns at every item's right edge, so the final slice keeps W-4
    columns — exactly the VALID shrink."""
    b, h, wd, ci = x_nhwc.shape
    dtype = x_nhwc.dtype
    if ci % 8:  # pad channels to a full sublane tile (stem conv has CI=1)
        pad = 8 - ci % 8
        x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, 0), (0, 0), (0, pad)))
        k0 = jnp.pad(k0, ((0, 0), (0, 0), (0, pad), (0, 0)))
    co0, co1 = k0.shape[3], k1.shape[3]
    stride = lane_stride(wd)
    one0 = jnp.ones((co0, 1), jnp.float32)
    one1 = jnp.ones((co1, 1), jnp.float32)
    y = conv3x3_lanes(
        to_lanes(x_nhwc), k0.astype(dtype),
        one0, b0.reshape(co0, 1), stride, relu=relu, interpret=interpret,
    )
    y = conv3x3_lanes(
        y, k1.astype(dtype),
        one1, b1.reshape(co1, 1), stride, relu=relu, interpret=interpret,
    )
    return from_lanes(y, b, wd - 4)


def conv3x3_nhwc(x, w, scale=None, bias=None, relu=True, interpret=False):
    """NHWC convenience wrapper: (B,H,W,CI) -> (B,H-2,W-2,CO)."""
    b, h, wd, ci = x.shape
    if ci % 8:
        pad = 8 - ci % 8
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
    co = w.shape[3]
    s = jnp.ones((co, 1), jnp.float32) if scale is None else scale.reshape(co, 1)
    bb = jnp.zeros((co, 1), jnp.float32) if bias is None else bias.reshape(co, 1)
    out_l = conv3x3_lanes(
        to_lanes(x), w.astype(x.dtype), s, bb,
        lane_stride(wd), relu=relu, interpret=interpret,
    )
    return from_lanes(out_l, b, wd - 2)
