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
               *, relu, lb, ci, co, rows, nby, nbl, segs=3, pool_ref=None,
               seg_shifts=None, pool_dense=False, unit_scale=False):
    """Pipelined variant: double-buffered window DMA across grid steps,
    `rows` output rows per MXU dot, `segs` lane-tap segments.

    - The window DMA for grid step i+1 is issued before step i's compute so
      HBM reads hide behind the dots (1.39 vs 2.36 ms on the enc0b shape).
    - rows>1 stacks consecutive output rows into one block-banded dot with
      exact M,K tile multiples; measured slower than rows=1 on v5e, kept
      for experimentation.
    - segs is the number of lane-shift tap groups in the packed weight
      matrix: 3 for the plain lanes conv (kx taps 0,1,2 — pack_w_banded),
      2 for the 2-phase space-to-depth conv (shift groups 0,1 —
      pack_w_phase2, where `ci`/`co` are the *doubled* phase-stacked
      channel counts).
    - pool_ref, if given, receives the fused 2x2 max-pool of the conv
      output: row pairs are maxed across the unrolled row loop and, for the
      2-phase layout, the phase pair (out channel halves) collapses to the
      dense 1-phase pooled tensor — the pool costs no extra memory pass.
    - pool_dense pools a DENSE 1-phase conv output instead: the column pair
      collapses by a lane roll-left max, so EVEN lanes of pool_ref hold the
      pooled columns (lane 2j = max over cols 2j,2j+1 and the row pair);
      odd lanes are garbage the caller's strided exit discards.
    """
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

    if seg_shifts is None:
        seg_shifts = tuple(range(segs))  # lane shifts per tap segment
    prev = None
    for r in range(0, TH, rows):
        xw = win[r : r + rows + 2].reshape((rows + 2) * ci, lb)
        y = jnp.dot(w_ref[:], xw, preferred_element_type=jnp.float32)
        for p in range(rows):
            seg0 = p * segs * co
            acc = None
            for s in range(segs):
                seg = y[seg0 + s * co : seg0 + (s + 1) * co]
                sh = seg_shifts[s] % lb
                if sh:
                    # roll left by seg_shifts[s] (negative -> right); wrap
                    # garbage lands only in dead tail lanes (left) or
                    # pre-zeroed tail lanes (right, backward pass)
                    seg = pltpu.roll(seg, lb - sh, 1)
                acc = seg if acc is None else acc + seg
            # unit_scale: folded-BN inference passes scale==1 — skip the
            # per-row VPU multiply (the affine already lives in kernel+bias)
            acc = acc + b_ref[:] if unit_scale else acc * s_ref[:] + b_ref[:]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[r + p] = acc.astype(out_ref.dtype)
            if pool_ref is not None:
                if pool_dense:
                    # column pair via roll-left max; even lanes valid
                    m = jnp.maximum(acc, pltpu.roll(acc, lb - 1, 1))
                else:
                    half = co // 2
                    m = jnp.maximum(acc[:half], acc[half:])  # phase pair
                if (r + p) % 2 == 0:
                    prev = m
                else:
                    pool_ref[(r + p) // 2] = jnp.maximum(prev, m).astype(
                        pool_ref.dtype
                    )


def _lane_block(total_lanes: int, item_stride: int,
                max_lanes: int = MAX_LANES) -> int:
    """Largest item-aligned lane block <= max_lanes that divides the total."""
    n_items = total_lanes // item_stride
    ipb = max(1, min(n_items, max_lanes // item_stride))
    while n_items % ipb:
        ipb -= 1
    return item_stride * ipb


VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _lane_budget(bytes_per_lane: int) -> int:
    """Lane-block cap from a per-lane VMEM cost (scratch windows, double-
    buffered output blocks, f32 dot results): Mosaic's scoped-vmem limit is
    16 MB and exceeding it is a compile error, not a slowdown."""
    return max(128, min(MAX_LANES, VMEM_BUDGET // max(1, bytes_per_lane)))


def _rows_per_dot(ci: int) -> int:
    """Output rows per MXU dot. Measured on v5e: rows=2 (block-banded dot
    with exact M,K tiles) LOSES to rows=1 even at CI=64 where the per-row
    dot is 1.5x1.5 tiles (1.56 vs 1.39 ms on the enc0b shape) — the win in
    v2 is the double-buffered DMA, not dot shape. Keep rows=1."""
    del ci
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "relu", "interpret", "rows", "pipelined",
                     "h_valid", "raw_rows", "fuse_pool"),
)
def conv3x3_lanes(x, w_hwio, scale, bias, item_stride: int,
                  relu: bool = True, interpret: bool = False,
                  rows: int = 0, pipelined: bool = True,
                  h_valid: int = 0, raw_rows: bool = False,
                  fuse_pool: bool = False):
    """Fused 3x3 VALID conv + affine + ReLU in the dense lanes layout.

    x:           (H, CI, L) bf16/f32, L = B * item_stride with item_stride a
                 multiple of 128 (see to_lanes). CI must be a sublane
                 multiple (8) — see double_conv_lanes for the stem pad.
    w_hwio:      (3, 3, CI, CO) conv kernel (packed internally).
    scale, bias: (CO, 1) f32 epilogue affine.
    rows:        output rows per dot (0 = auto); pipelined selects the
                 double-buffered-DMA kernel.
    h_valid/raw_rows: the valid-rows protocol (see conv3x3_phase2) — pad
                 once at ingest, let garbage tail rows flow, slice at exit.
    fuse_pool:   also emit the 2x2 max-pool of the conv output as a SPARSE
                 dense-lanes tensor: even lane 2j = pooled column j, odd
                 lanes garbage (the column pair collapses by a lane
                 roll-max in the epilogue; callers exit with a ::2 slice).
    Returns (H-2 rounded up to TH [+spare], CO, L) — and the sparse pooled
    tensor when fuse_pool; the caller slices [:ho] (unless raw_rows) and
    keeps only each item's first W-2 valid columns.
    """
    h, ci, lanes = x.shape
    co = w_hwio.shape[3]
    rows = rows or _rows_per_dot(ci)
    hv = h_valid or h
    ho = hv - 2
    nby = -(-ho // TH)
    h_pad = (nby - 1) * TH + WIN
    if h_pad > h:
        x = jnp.pad(x, ((0, h_pad - h), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * WIN * ci + 2 * TH * co) * isz + 3 * co * 4
    if fuse_pool:
        bpl += (TH // 2) * co * isz
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb
    spare = TH if raw_rows else 0

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
        assert not fuse_pool, "fuse_pool requires the pipelined kernel"
        w_all = pack_w_all(w_hwio.astype(x.dtype))
        kernel = functools.partial(_kernel, relu=relu, lb=lb, ci=ci, co=co)
        scratch = [
            pltpu.VMEM((WIN, ci, lb), x.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),    # x (manual DMA)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # w_all
        pl.BlockSpec(memory_space=pltpu.VMEM),   # scale
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
    ]
    out_specs = pl.BlockSpec(
        (TH, co, lb), lambda by, bl: (by, 0, bl), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((nby * TH + spare, co, lanes), x.dtype)
    if fuse_pool:
        def kernel_fp(x_ref, w_ref, s_ref, b_ref, out_ref, pool_ref,
                      win_ref, sem):
            _kernel_v2(
                x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
                relu=relu, lb=lb, ci=ci, co=co, rows=rows,
                nby=nby, nbl=nbl, pool_ref=pool_ref, pool_dense=True,
            )

        out, pooled = pl.pallas_call(
            kernel_fp,
            grid=(nby, nbl),
            in_specs=in_specs,
            out_specs=(
                out_specs,
                pl.BlockSpec(
                    (TH // 2, co, lb), lambda by, bl: (by, 0, bl),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=(
                out_shape,
                # full spare TH block — see conv3x3_phase2's fuse_pool note
                jax.ShapeDtypeStruct(
                    (nby * TH // 2 + spare, co, lanes), x.dtype
                ),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, w_all, scale, bias)
        if raw_rows:
            return out, pooled
        return out[:ho], pooled[: ho // 2]
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w_all, scale, bias)
    return out if raw_rows else out[:ho]


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


def pack_w_phase2(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, CI, CO) -> (4*CO, 6*CI) for the 2-phase space-to-depth conv.

    2-phase layout: lane j of phase p holds true column 2j+p, phases stacked
    on the channel axis ([phase0 ci..., phase1 ci...]). A VALID 3x3 conv then
    needs only lane shifts {0, 1}:
        out[p=0, j] = W0 x(0,j) + W1 x(1,j) + W2 x(0,j+1)
        out[p=1, j] = W0 x(1,j) + W1 x(0,j+1) + W2 x(1,j+1)
    Packed as M=(shift s, phase p, co), K=(ky, phase q, ci): 6 nonzero blocks
    of 8 (75% density) with exact 128-tiles from CI=64 up — the same
    effective dot class that measures ~150 TF/s at C=128."""
    ci, co = w_hwio.shape[2], w_hwio.shape[3]
    z = jnp.zeros_like(w_hwio[:, 0])  # (3, ci, co)
    blk = {
        (0, 0, 0): w_hwio[:, 0], (0, 0, 1): w_hwio[:, 1],
        (0, 1, 0): z,            (0, 1, 1): w_hwio[:, 0],
        (1, 0, 0): w_hwio[:, 2], (1, 0, 1): z,
        (1, 1, 0): w_hwio[:, 1], (1, 1, 1): w_hwio[:, 2],
    }
    rows_out = []
    for s in range(2):
        for p in range(2):
            kb = jnp.stack([blk[(s, p, 0)], blk[(s, p, 1)]], axis=1)
            rows_out.append(kb.reshape(6 * ci, co).T)
    return jnp.concatenate(rows_out, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "relu", "interpret", "fuse_pool",
                     "h_valid", "raw_rows", "unit_scale"),
)
def conv3x3_phase2(x, w_hwio, scale, bias, item_stride: int,
                   relu: bool = True, interpret: bool = False,
                   fuse_pool: bool = False, h_valid: int = 0,
                   raw_rows: bool = False, unit_scale: bool = False):
    """Fused 3x3 VALID conv (+ affine + ReLU) in the 2-phase lanes layout.

    x: (H, 2*CI, L) phase-stacked (see to_lanes_p2); scale/bias (CO, 1).
    Returns (H-2 padded to TH, 2*CO, L); with fuse_pool also the 2x2
    max-pooled DENSE 1-phase tensor ((H-2)//2 padded, CO, L) — pooling a
    2-phase tensor is elementwise (row pair max + phase pair max; the pooled
    column j IS lane j), so it rides the conv epilogue for free.

    Valid-rows protocol (the tier-1 net): h_valid marks how many leading
    rows of x are real; with raw_rows=True the output keeps one spare TH
    block of garbage tail rows and is NOT sliced — a full-tensor jnp.pad on
    entry and slice-copy on exit cost ~2.5 ms EACH at the bench shapes
    (profiled), so the chain pads once at ingest and slices once at exit."""
    h, ci2, lanes = x.shape
    ci = ci2 // 2
    co = w_hwio.shape[3]
    hv = h_valid or h
    ho = hv - 2
    nby = -(-ho // TH)
    h_pad = (nby - 1) * TH + WIN
    if h_pad > h:
        x = jnp.pad(x, ((0, h_pad - h), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * WIN * ci2 + 2 * TH * 2 * co) * isz + 2 * 2 * co * 4
    if fuse_pool:
        bpl += 2 * (TH // 2) * co * isz
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    w_all = pack_w_phase2(w_hwio.astype(x.dtype))
    s2 = jnp.concatenate([scale, scale], axis=0)
    b2 = jnp.concatenate([bias, bias], axis=0)
    spare = TH if raw_rows else 0
    out_specs = pl.BlockSpec(
        (TH, 2 * co, lb), lambda by, bl: (by, 0, bl), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((nby * TH + spare, 2 * co, lanes), x.dtype)
    if fuse_pool:
        def kernel_fp(x_ref, w_ref, s_ref, b_ref, out_ref, pool_ref,
                      win_ref, sem):
            _kernel_v2(
                x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
                relu=relu, lb=lb, ci=ci2, co=2 * co, rows=1,
                nby=nby, nbl=nbl, segs=2, pool_ref=pool_ref,
                unit_scale=unit_scale,
            )

        out, pooled = pl.pallas_call(
            kernel_fp,
            grid=(nby, nbl),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                out_specs,
                pl.BlockSpec(
                    (TH // 2, co, lb), lambda by, bl: (by, 0, bl),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=(
                out_shape,
                # a FULL spare TH block on the pooled tensor (not spare//2):
                # a following lanes conv at half resolution needs
                # (nby'-1)*TH + WIN rows, which one TH block always covers —
                # spare//2 can fall 2 rows short and force a full-tensor pad
                jax.ShapeDtypeStruct(
                    (nby * TH // 2 + spare, co, lanes), x.dtype
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, WIN, ci2, lb), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(x, w_all, s2, b2)
        if raw_rows:
            return out, pooled
        return out[:ho], pooled[: ho // 2]

    def kernel_plain(x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem):
        _kernel_v2(
            x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
            relu=relu, lb=lb, ci=ci2, co=2 * co, rows=1,
            nby=nby, nbl=nbl, segs=2, unit_scale=unit_scale,
        )

    out = pl.pallas_call(
        kernel_plain,
        grid=(nby, nbl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, WIN, ci2, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w_all, s2, b2)
    return out if raw_rows else out[:ho]


WIN2 = TH + 4     # input rows per fused enc0 window (two chained 3x3s)


def _kernel_conv_head(x_ref, w_ref, b_ref, kh_ref, bh_ref, out_ref,
                      win_ref, sem, *, lb, ci2, co2, nco2, nby, nbl):
    """conv3x3 (2-phase) + fused 1x1 head: the conv activation never
    reaches HBM — each row's post-ReLU acc feeds a tiny block-diagonal
    head dot ((2*nc, CO2) @ (CO2, lb)) whose logits are the only output
    (~16x smaller than the activation at the bench head)."""
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

    co = co2 // 2
    for r in range(TH):
        x3 = win[r : r + 3].reshape(3 * ci2, lb)
        y = jnp.dot(w_ref[:], x3, preferred_element_type=jnp.float32)
        acc = y[:co2] + pltpu.roll(y[co2:], lb - 1, 1)
        acc = jnp.maximum(acc + b_ref[:], 0.0)
        # head dot on the compute-dtype-rounded activation (matches the
        # unfused path, which stores the activation in bf16 before the 1x1)
        h = jnp.dot(kh_ref[:], acc.astype(win.dtype),
                    preferred_element_type=jnp.float32)
        out_ref[r] = (h + bh_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("item_stride", "h_valid", "raw_rows",
                              "interpret"),
)
def conv3x3_head_phase2(x, w_hwio, bias, k_head, b_head, item_stride: int,
                        h_valid: int = 0, raw_rows: bool = False,
                        interpret: bool = False):
    """Last decoder conv + 1x1 classifier head as ONE kernel (2-phase).

    x: (H, 2*CI, L); w_hwio: (3, 3, CI, CO); bias: (CO, 1) f32;
    k_head: (CO, NC) 1x1 kernel; b_head: (NC,) f32. Returns f32 logits
    (H-2 padded, 2*NC, L) in the 2-phase layout (from_lanes_p2 applies).

    reference: models/unet_model.py:68-71 (OutConv) fused into the final
    DoubleConv's second conv."""
    h, ci2, lanes = x.shape
    ci = ci2 // 2
    co = w_hwio.shape[3]
    nc = k_head.shape[1]
    hv = h_valid or h
    ho = hv - 2
    nby = -(-ho // TH)
    h_pad = (nby - 1) * TH + WIN
    if h_pad > h:
        x = jnp.pad(x, ((0, h_pad - h), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * WIN * ci2) * isz + 2 * TH * 2 * nc * 4 + 3 * 2 * co * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    w_all = pack_w_phase2(w_hwio.astype(x.dtype))
    b2 = jnp.concatenate([bias, bias], axis=0)
    # block-diagonal head: one (2*NC, 2*CO) dot covers both phases
    khT = k_head.astype(x.dtype).T  # (NC, CO)
    z = jnp.zeros_like(khT)
    kh = jnp.concatenate(
        [jnp.concatenate([khT, z], axis=1),
         jnp.concatenate([z, khT], axis=1)], axis=0,
    )  # (2*NC, 2*CO)
    bh = jnp.tile(b_head.reshape(-1), 2).reshape(2 * nc, 1)
    spare = TH if raw_rows else 0
    kernel = functools.partial(
        _kernel_conv_head, lb=lb, ci2=ci2, co2=2 * co, nco2=2 * nc,
        nby=nby, nbl=nbl,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(
            (TH, 2 * nc, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nby * TH + spare, 2 * nc, lanes), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, ci2, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w_all, b2, kh, bh)
    return out if raw_rows else out[:ho]


def _kernel_enc0_fused(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
                       pool_ref, win_ref, hbuf_ref, sem, *, lb, ci2_in,
                       co0, nby, nbl):
    """Fused stem + enc0 conv1 + 2x2 pool in the 2-phase lanes layout.

    The chained kernels round-trip the stem output through HBM (~1.07 GB
    written + read again at the bench geometry); here it lives in a VMEM
    scratch: each grid step DMAs TH+4 input rows, computes TH+2 stem rows
    into `hbuf`, then TH conv1 rows (+ fused pool) from `hbuf`. Adjacent
    steps recompute 2 stem rows (25% stem overhead — the stem dot is K=24,
    noise next to the conv1 dots). Roll garbage propagates one extra lane
    column per conv exactly as in the chained form, so valid-width algebra
    is unchanged."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl
    co2 = 2 * co0

    def dma(slot, stp):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds((stp // nbl) * TH, WIN2), :,
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

    for r in range(WIN):  # TH + 2 stem rows
        x3 = win[r : r + 3].reshape(3 * ci2_in, lb)
        y = jnp.dot(w0_ref[:], x3, preferred_element_type=jnp.float32)
        acc = y[:co2] + pltpu.roll(y[co2:], lb - 1, 1)
        acc = jnp.maximum(acc + b0_ref[:], 0.0)
        hbuf_ref[r] = acc.astype(hbuf_ref.dtype)

    prev = None
    for r in range(TH):
        x3 = hbuf_ref[r : r + 3].reshape(3 * co2, lb)
        y = jnp.dot(w1_ref[:], x3, preferred_element_type=jnp.float32)
        acc = y[:co2] + pltpu.roll(y[co2:], lb - 1, 1)
        acc = jnp.maximum(acc + b1_ref[:], 0.0)
        out_ref[r] = acc.astype(out_ref.dtype)
        m = jnp.maximum(acc[:co0], acc[co0:])  # phase pair
        if r % 2 == 0:
            prev = m
        else:
            pool_ref[r // 2] = jnp.maximum(prev, m).astype(pool_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("item_stride", "h_valid", "interpret")
)
def enc0_fused_phase2(x, w0_hwio, b0, w1_hwio, b1, item_stride: int,
                      h_valid: int = 0, interpret: bool = False):
    """Stem conv + enc0 conv1 + fused 2x2 pool as ONE kernel (2-phase lanes).

    x: (H, 2*CI0, L) phase-stacked ingest (CI0 the padded stem channels);
    w0_hwio: (3, 3, CI0, F), w1_hwio: (3, 3, F, F); b0/b1: (F, 1) f32.
    Always raw_rows: returns (skip, pooled) with one spare TH block of
    garbage tail rows each, skip (nby*TH+TH, 2*F, L) and pooled
    (nby*TH//2+TH, F, L) — the tier-1 ingest protocol (see conv3x3_phase2).

    reference: models/unet_model.py:73-77 (inc DoubleConv + first pool)."""
    h, ci2_in, lanes = x.shape
    co0 = w0_hwio.shape[3]
    hv = h_valid or h
    ho = hv - 4
    nby = -(-ho // TH)
    need = (nby - 1) * TH + WIN2
    if need > h:
        x = jnp.pad(x, ((0, need - h), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * WIN2 * ci2_in + WIN * 2 * co0 + 2 * TH * 2 * co0
           + (TH // 2) * co0) * isz + 4 * 2 * co0 * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    w0 = pack_w_phase2(w0_hwio.astype(x.dtype))
    w1 = pack_w_phase2(w1_hwio.astype(x.dtype))
    b02 = jnp.concatenate([b0, b0], axis=0)
    b12 = jnp.concatenate([b1, b1], axis=0)
    kernel = functools.partial(
        _kernel_enc0_fused, lb=lb, ci2_in=ci2_in, co0=co0, nby=nby, nbl=nbl
    )
    out, pooled = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (TH, 2 * co0, lb), lambda by, bl: (by, 0, bl),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TH // 2, co0, lb), lambda by, bl: (by, 0, bl),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nby * TH + TH, 2 * co0, lanes), x.dtype),
            # full spare TH block on the pooled tensor (see conv3x3_phase2)
            jax.ShapeDtypeStruct((nby * TH // 2 + TH, co0, lanes), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN2, ci2_in, lb), x.dtype),
            pltpu.VMEM((WIN, 2 * co0, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w0, b02, w1, b12)
    return out, pooled


def _kernel_tconv(x_ref, w_ref, b_ref, out_ref, win_ref, sem,
                  *, lb, ci, co, nby, nbl, th_in):
    """2x2-stride-2 transposed conv, dense 1-phase input -> 2-phase output.

    out[2r+dy, 2j+dx] = sum_ci W[dy,dx,ci,co] x[r,j]: with the 2-phase
    output convention (phase dx at lane j) every output lands at the SAME
    lane as its input — no shifts at all. One (4*CO, CI) dot per input row;
    M rows ordered (dy, phase dx, co) so row dy's two phase blocks are a
    contiguous (2*CO, lb) slice."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma(slot, stp):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds((stp // nbl) * th_in, th_in), :,
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

    for r in range(th_in):
        y = jnp.dot(w_ref[:], win[r], preferred_element_type=jnp.float32)
        for dy in range(2):
            acc = y[dy * 2 * co : (dy + 1) * 2 * co] + b_ref[:]
            out_ref[2 * r + dy] = acc.astype(out_ref.dtype)


def pack_w_tconv(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, CI, CO) -> (4*CO, CI), M ordered (dy, phase dx, co).

    flax/lax conv_transpose applies the kernel spatially FLIPPED
    (out[2r+dy, 2j+dx] += W[1-dy, 1-dx] · x[r, j]; verified numerically),
    so flip both spatial dims here to match nn.ConvTranspose parameters."""
    ci, co = w_hwio.shape[2], w_hwio.shape[3]
    return w_hwio[::-1, ::-1].transpose(0, 1, 3, 2).reshape(4 * co, ci)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "interpret", "h_valid", "raw_rows"),
)
def tconv2x2_phase2(x, w_hwio, bias, item_stride: int,
                    interpret: bool = False, h_valid: int = 0,
                    raw_rows: bool = False):
    """k=2 s=2 VALID transposed conv: dense lanes (H, CI, L) -> 2-phase
    (2*H, 2*CO, L) at the same stride. bias: (CO, 1). h_valid/raw_rows: see
    conv3x3_phase2's valid-rows protocol."""
    h, ci, lanes = x.shape
    hv = h_valid or h
    co = w_hwio.shape[3]
    th_in = TH // 2
    nby = -(-hv // th_in)
    if nby * th_in > h:
        x = jnp.pad(x, ((0, nby * th_in - h), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * th_in * ci + 2 * 2 * th_in * 2 * co) * isz + 4 * co * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb
    w_all = pack_w_tconv(w_hwio.astype(x.dtype))
    b2 = jnp.concatenate([bias, bias], axis=0)
    spare = TH if raw_rows else 0
    kernel = functools.partial(
        _kernel_tconv, lb=lb, ci=ci, co=co, nby=nby, nbl=nbl, th_in=th_in
    )
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * th_in, 2 * co, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (2 * nby * th_in + spare, 2 * co, lanes), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th_in, ci, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w_all, b2)
    return out if raw_rows else out[: 2 * hv]


def _kernel_dec0(skip_ref, up_ref, ws_ref, wu_ref, s_ref, b_ref, out_ref,
                 wins_ref, winu_ref, sems, *, relu, lb, cis2, ciu2, co2,
                 nby, nbl, row_off, lane_off, unit_scale=False):
    """Decoder-entry conv: 3x3 VALID over concat(center-cropped skip, up),
    both in the 2-phase lanes layout, WITHOUT materializing the crop or the
    concat. The skip's center-crop becomes a static DMA row offset plus
    `lane_off` added to its two segment rolls (roll garbage wraps into each
    item's dead tail lanes — same argument as the kx taps). Two dots per
    row (skip channels, up channels) accumulate into one epilogue."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma_skip(slot, stp):
        return pltpu.make_async_copy(
            skip_ref.at[pl.ds(row_off + (stp // nbl) * TH, WIN), :,
                        pl.ds((stp % nbl) * lb, lb)],
            wins_ref.at[slot],
            sems.at[0, slot],
        )

    def dma_up(slot, stp):
        return pltpu.make_async_copy(
            up_ref.at[pl.ds((stp // nbl) * TH, WIN), :,
                      pl.ds((stp % nbl) * lb, lb)],
            winu_ref.at[slot],
            sems.at[1, slot],
        )

    @pl.when(step == 0)
    def _():
        dma_up(0, 0).start()
        dma_skip(0, 0).start()

    @pl.when(step + 1 < nby * nbl)
    def _():
        dma_up((step + 1) % 2, step + 1).start()
        dma_skip((step + 1) % 2, step + 1).start()

    dma_up(step % 2, step).wait()
    dma_skip(step % 2, step).wait()
    wins = wins_ref.at[step % 2]
    winu = winu_ref.at[step % 2]

    for r in range(TH):
        xs = wins[r : r + 3].reshape(3 * cis2, lb)
        xu = winu[r : r + 3].reshape(3 * ciu2, lb)
        ys = jnp.dot(ws_ref[:], xs, preferred_element_type=jnp.float32)
        yu = jnp.dot(wu_ref[:], xu, preferred_element_type=jnp.float32)
        acc = yu[:co2] + pltpu.roll(yu[co2:], lb - 1, 1)
        acc = acc + pltpu.roll(ys[:co2], lb - lane_off, 1)
        acc = acc + pltpu.roll(ys[co2:], lb - lane_off - 1, 1)
        acc = acc + b_ref[:] if unit_scale else acc * s_ref[:] + b_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[r] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "out_rows", "row_off", "lane_off",
                     "relu", "interpret", "raw_rows", "unit_scale"),
)
def dec_conv0_phase2(skip, up, w_hwio, scale, bias, item_stride: int,
                     out_rows: int, row_off: int, lane_off: int,
                     relu: bool = True, interpret: bool = False,
                     raw_rows: bool = False, unit_scale: bool = False):
    """First decoder conv of a block: conv3x3(concat(crop(skip), up)).

    skip: (H_s, 2*CI_s, L) 2-phase; up: (H_u, 2*CI_u, L) 2-phase, same L.
    w_hwio: (3, 3, CI_s + CI_u, CO) — the trained concat-conv kernel, skip
    channels first (FoldedUNet concat order). The crop is (row_off,
    2*lane_off) pixels: row_off must be the full-pixel row offset and
    lane_off the PHASE-lane column offset (full-pixel offset / 2 — even
    full-pixel column offsets only). Returns (out_rows, 2*CO, L)."""
    h_u, ciu2, lanes = up.shape
    _, cis2, _ = skip.shape
    cis, ciu = cis2 // 2, ciu2 // 2
    co = w_hwio.shape[3]
    nby = -(-out_rows // TH)
    need_s = row_off + (nby - 1) * TH + WIN
    if need_s > skip.shape[0]:
        skip = jnp.pad(skip, ((0, need_s - skip.shape[0]), (0, 0), (0, 0)))
    need_u = (nby - 1) * TH + WIN
    if need_u > h_u:
        up = jnp.pad(up, ((0, need_u - h_u), (0, 0), (0, 0)))
    isz = up.dtype.itemsize
    # both windows double-buffered (the skip read used to serialize with
    # compute; at the 384-lane item stride the lane block stays 768)
    bpl = (2 * WIN * cis2 + 2 * WIN * ciu2 + 2 * TH * 2 * co) * isz + 2 * 2 * 2 * co * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    dtype = up.dtype
    w_s = pack_w_phase2(w_hwio[:, :, :cis].astype(dtype))
    w_u = pack_w_phase2(w_hwio[:, :, cis:].astype(dtype))
    s2 = jnp.concatenate([scale, scale], axis=0)
    b2 = jnp.concatenate([bias, bias], axis=0)
    spare = TH if raw_rows else 0
    kernel = functools.partial(
        _kernel_dec0, relu=relu, lb=lb, cis2=cis2, ciu2=ciu2, co2=2 * co,
        nby=nby, nbl=nbl, row_off=row_off, lane_off=lane_off,
        unit_scale=unit_scale,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(
            (TH, 2 * co, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nby * TH + spare, 2 * co, lanes), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, cis2, lb), dtype),
            pltpu.VMEM((2, WIN, ciu2, lb), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(skip, up, w_s, w_u, s2, b2)
    return out if raw_rows else out[:out_rows]


def _kernel_dec_tail(skip_ref, up_ref, ws_ref, wu_ref, b0_ref, w1_ref,
                     b1_ref, kh_ref, bh_ref, out_ref, wins_ref, winu_ref,
                     hbuf_ref, sems, *, lb, cis2, ciu2, co2, nby, nbl,
                     row_off, lane_off):
    """Whole decoder tail — dec conv0 (skip crop folded into DMA offsets +
    rolls), dec conv1, and the 1x1 head — as ONE kernel. The conv0 output
    lives in a VMEM scratch (TH+2 rows per grid step, 2 rows recomputed at
    block seams) and the conv1 activation feeds the head dot in-register,
    so the only HBM writes are the f32 logits (~16x smaller than either
    activation)."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma_skip(slot, stp):
        return pltpu.make_async_copy(
            skip_ref.at[pl.ds(row_off + (stp // nbl) * TH, WIN2), :,
                        pl.ds((stp % nbl) * lb, lb)],
            wins_ref.at[slot],
            sems.at[0, slot],
        )

    def dma_up(slot, stp):
        return pltpu.make_async_copy(
            up_ref.at[pl.ds((stp // nbl) * TH, WIN2), :,
                      pl.ds((stp % nbl) * lb, lb)],
            winu_ref.at[slot],
            sems.at[1, slot],
        )

    @pl.when(step == 0)
    def _():
        dma_up(0, 0).start()
        dma_skip(0, 0).start()

    @pl.when(step + 1 < nby * nbl)
    def _():
        dma_up((step + 1) % 2, step + 1).start()
        dma_skip((step + 1) % 2, step + 1).start()

    dma_up(step % 2, step).wait()
    dma_skip(step % 2, step).wait()
    wins = wins_ref.at[step % 2]
    winu = winu_ref.at[step % 2]

    sh0 = (lb - lane_off) % lb
    for r in range(WIN):  # TH + 2 conv0 rows
        xs = wins[r : r + 3].reshape(3 * cis2, lb)
        xu = winu[r : r + 3].reshape(3 * ciu2, lb)
        ys = jnp.dot(ws_ref[:], xs, preferred_element_type=jnp.float32)
        yu = jnp.dot(wu_ref[:], xu, preferred_element_type=jnp.float32)
        acc = yu[:co2] + pltpu.roll(yu[co2:], lb - 1, 1)
        s0 = ys[:co2] if sh0 == 0 else pltpu.roll(ys[:co2], sh0, 1)
        acc = acc + s0 + pltpu.roll(ys[co2:], lb - lane_off - 1, 1)
        acc = jnp.maximum(acc + b0_ref[:], 0.0)
        hbuf_ref[r] = acc.astype(hbuf_ref.dtype)

    for r in range(TH):
        x3 = hbuf_ref[r : r + 3].reshape(3 * co2, lb)
        y = jnp.dot(w1_ref[:], x3, preferred_element_type=jnp.float32)
        acc = y[:co2] + pltpu.roll(y[co2:], lb - 1, 1)
        acc = jnp.maximum(acc + b1_ref[:], 0.0)
        h = jnp.dot(kh_ref[:], acc.astype(hbuf_ref.dtype),
                    preferred_element_type=jnp.float32)
        out_ref[r] = (h + bh_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "out_rows", "row_off", "lane_off",
                     "raw_rows", "interpret"),
)
def dec_tail_phase2(skip, up, w0_hwio, b0, w1_hwio, b1, k_head, b_head,
                    item_stride: int, out_rows: int, row_off: int,
                    lane_off: int, raw_rows: bool = False,
                    interpret: bool = False):
    """conv3x3(concat(crop(skip), up)) -> conv3x3 -> 1x1 head, one kernel.

    skip: (H_s, 2*CI_s, L) 2-phase; up: (H_u, 2*CI_u, L) 2-phase, same L.
    w0_hwio: (3, 3, CI_s + CI_u, CO) (skip channels first), b0: (CO, 1);
    w1_hwio: (3, 3, CO, CO), b1: (CO, 1); k_head: (CO, NC), b_head: (NC,).
    out_rows is the conv1 valid-row count; the crop is (row_off,
    2*lane_off) pixels as in dec_conv0_phase2. Returns f32 logits
    (out_rows padded [+spare], 2*NC, L).

    reference: models/unet_model.py:23-46 (Up: crop+concat+DoubleConv) +
    :68-71 (OutConv), the whole decoder tail of the forward."""
    h_u, ciu2, lanes = up.shape
    _, cis2, _ = skip.shape
    cis = cis2 // 2
    co = w0_hwio.shape[3]
    nc = k_head.shape[1]
    nby = -(-out_rows // TH)
    need_u = (nby - 1) * TH + WIN2
    if need_u > h_u:
        up = jnp.pad(up, ((0, need_u - h_u), (0, 0), (0, 0)))
    need_s = row_off + need_u
    if need_s > skip.shape[0]:
        skip = jnp.pad(skip, ((0, need_s - skip.shape[0]), (0, 0), (0, 0)))
    isz = up.dtype.itemsize
    bpl = (2 * WIN2 * cis2 + 2 * WIN2 * ciu2 + WIN * 2 * co) * isz \
        + 2 * TH * 2 * nc * 4 + 4 * 2 * co * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    dtype = up.dtype
    w_s = pack_w_phase2(w0_hwio[:, :, :cis].astype(dtype))
    w_u = pack_w_phase2(w0_hwio[:, :, cis:].astype(dtype))
    w_1 = pack_w_phase2(w1_hwio.astype(dtype))
    b02 = jnp.concatenate([b0, b0], axis=0)
    b12 = jnp.concatenate([b1, b1], axis=0)
    khT = k_head.astype(dtype).T
    z = jnp.zeros_like(khT)
    kh = jnp.concatenate(
        [jnp.concatenate([khT, z], axis=1),
         jnp.concatenate([z, khT], axis=1)], axis=0,
    )
    bh = jnp.tile(b_head.reshape(-1), 2).reshape(2 * nc, 1)
    spare = TH if raw_rows else 0
    kernel = functools.partial(
        _kernel_dec_tail, lb=lb, cis2=cis2, ciu2=ciu2, co2=2 * co,
        nby=nby, nbl=nbl, row_off=row_off, lane_off=lane_off,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (TH, 2 * nc, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nby * TH + spare, 2 * nc, lanes), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN2, cis2, lb), dtype),
            pltpu.VMEM((2, WIN2, ciu2, lb), dtype),
            pltpu.VMEM((WIN, 2 * co, lb), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(skip, up, w_s, w_u, b02, w_1, b12, kh, bh)
    return out if raw_rows else out[:out_rows]


def _kernel_dec0_dense(skip_ref, up_ref, ws_ref, wu_ref, s_ref, b_ref,
                       out_ref, wins_ref, winu_ref, sems, *, relu, lb, cis,
                       ciu, co, nby, nbl, row_off, lane_off):
    """Dense-layout decoder-entry conv: 3x3 VALID over
    concat(center-cropped skip, up), both DENSE 1-phase lanes tensors,
    without materializing the crop or the concat. The skip's crop is a
    static DMA row offset plus `lane_off` added to its three kx-tap rolls
    (dense layout: lane == column, so any integer column offset works —
    no phase-parity constraint). Two dots per row accumulate into one
    epilogue."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma_skip(stp):
        # single-buffered: issued at step start, waited right before use
        return pltpu.make_async_copy(
            skip_ref.at[pl.ds(row_off + (stp // nbl) * TH, WIN), :,
                        pl.ds((stp % nbl) * lb, lb)],
            wins_ref,
            sems.at[0, 0],
        )

    def dma_up(slot, stp):
        return pltpu.make_async_copy(
            up_ref.at[pl.ds((stp // nbl) * TH, WIN), :,
                      pl.ds((stp % nbl) * lb, lb)],
            winu_ref.at[slot],
            sems.at[1, slot],
        )

    dma_skip(step).start()

    @pl.when(step == 0)
    def _():
        dma_up(0, 0).start()

    @pl.when(step + 1 < nby * nbl)
    def _():
        dma_up((step + 1) % 2, step + 1).start()

    dma_up(step % 2, step).wait()
    dma_skip(step).wait()
    wins = wins_ref
    winu = winu_ref.at[step % 2]

    for r in range(TH):
        xs = wins[r : r + 3].reshape(3 * cis, lb)
        xu = winu[r : r + 3].reshape(3 * ciu, lb)
        ys = jnp.dot(ws_ref[:], xs, preferred_element_type=jnp.float32)
        yu = jnp.dot(wu_ref[:], xu, preferred_element_type=jnp.float32)
        acc = (
            yu[:co]
            + pltpu.roll(yu[co : 2 * co], lb - 1, 1)
            + pltpu.roll(yu[2 * co :], lb - 2, 1)
        )
        acc = acc + pltpu.roll(ys[:co], (lb - lane_off) % lb, 1)
        acc = acc + pltpu.roll(ys[co : 2 * co], lb - lane_off - 1, 1)
        acc = acc + pltpu.roll(ys[2 * co :], lb - lane_off - 2, 1)
        acc = acc * s_ref[:] + b_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[r] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "out_rows", "row_off", "lane_off",
                     "relu", "interpret", "raw_rows"),
)
def dec_conv0_lanes(skip, up, w_hwio, scale, bias, item_stride: int,
                    out_rows: int, row_off: int, lane_off: int,
                    relu: bool = True, interpret: bool = False,
                    raw_rows: bool = False):
    """First decoder conv of a block in the DENSE lanes layout:
    conv3x3(concat(crop(skip), up)).

    skip: (H_s, CI_s, L) dense; up: (H_u, CI_u, L) dense, same L.
    w_hwio: (3, 3, CI_s + CI_u, CO) — the trained concat-conv kernel, skip
    channels first (FoldedUNet concat order). The crop offset is (row_off,
    lane_off) pixels with no parity constraint (dense lanes: lane ==
    column). Returns (out_rows [+spare], CO, L)."""
    h_u, ciu, lanes = up.shape
    _, cis, _ = skip.shape
    co = w_hwio.shape[3]
    nby = -(-out_rows // TH)
    need_s = row_off + (nby - 1) * TH + WIN
    if need_s > skip.shape[0]:
        skip = jnp.pad(skip, ((0, need_s - skip.shape[0]), (0, 0), (0, 0)))
    need_u = (nby - 1) * TH + WIN
    if need_u > h_u:
        up = jnp.pad(up, ((0, need_u - h_u), (0, 0), (0, 0)))
    isz = up.dtype.itemsize
    bpl = (WIN * cis + 2 * WIN * ciu + 2 * TH * co) * isz + 3 * 2 * co * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    # roll garbage from the skip's lane_off+2 left-shift must land in dead
    # tail lanes only (same argument as the kx taps)
    assert lane_off + 2 + out_rows <= item_stride, "crop shift exceeds tail"

    nbl = lanes // lb
    dtype = up.dtype
    w_s = pack_w_all(w_hwio[:, :, :cis].astype(dtype))
    w_u = pack_w_all(w_hwio[:, :, cis:].astype(dtype))
    spare = TH if raw_rows else 0
    kernel = functools.partial(
        _kernel_dec0_dense, relu=relu, lb=lb, cis=cis, ciu=ciu, co=co,
        nby=nby, nbl=nbl, row_off=row_off, lane_off=lane_off,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(
            (TH, co, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nby * TH + spare, co, lanes), dtype),
        scratch_shapes=[
            pltpu.VMEM((WIN, cis, lb), dtype),
            pltpu.VMEM((2, WIN, ciu, lb), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(skip, up, w_s, w_u, scale, bias)
    return out if raw_rows else out[:out_rows]


def from_lanes_sparse2(x_l: jnp.ndarray, b: int, w_valid: int) -> jnp.ndarray:
    """Sparse pooled dense-lanes (H, C, B*stride) -> (B, H, w_valid, C):
    valid columns live at EVEN lanes (conv3x3_lanes fuse_pool output)."""
    h, c, bl = x_l.shape
    stride = bl // b
    xs = x_l.reshape(h, c, b, stride)[:, :, :, : 2 * w_valid : 2]
    return xs.transpose(2, 0, 3, 1)


def to_lanes_p2(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> 2-phase lanes (H, 2*C, B*stride): even columns in the
    first C channels, odd columns in the second, stride = lane_stride of the
    half width."""
    b, h, w, c = x_nhwc.shape
    wp = -(-w // 2)
    stride = lane_stride(wp)
    if 2 * stride > w:
        x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, 0), (0, 2 * stride - w), (0, 0)))
    xs = x_nhwc.reshape(b, h, stride, 2, c)
    xp = jnp.concatenate([xs[:, :, :, 0], xs[:, :, :, 1]], axis=-1)
    return xp.transpose(1, 3, 0, 2).reshape(h, 2 * c, b * stride)


def from_lanes_p2(x_l: jnp.ndarray, b: int, w_valid: int) -> jnp.ndarray:
    """2-phase lanes (H, 2*C, B*stride) -> (B, H, w_valid, C)."""
    h, c2, bl = x_l.shape
    c = c2 // 2
    stride = bl // b
    xp = x_l.reshape(h, 2, c, b, stride).transpose(3, 0, 4, 1, 2)
    return xp.reshape(b, h, 2 * stride, c)[:, :, :w_valid]


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
