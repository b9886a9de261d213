"""Training-mode 2-phase lanes conv: custom VJP with Pallas forward AND
backward kernels.

The train step's profile is dominated by the big-spatial low-channel stages
(enc0 25 ms, dec3 12 ms of a 67 ms batch-4 step), and most of that is not
conv FLOPs but the layout churn XLA's conv lowering forces on the
surrounding elementwise/BN/residual traffic (docs/PARITY.md). Running those
convs in the 2-phase lanes layout (ops/pallas/conv3x3.py) keeps every
surrounding op a trivially-laid-out elementwise/reduce — but only if the
BACKWARD pass also stays in lanes. This module provides:

- dx: full correlation of the (lane-masked) output gradient with the
  transposed/flipped kernel — the same `_kernel_v2` machinery with
  seg_shifts (0, -1): right-rolls pull pre-zeroed tail lanes, so zero
  padding comes free (pack_w_phase2_dx);
- dW: per-row MXU contractions over the LANE axis, X3 (3*2CI, lb) x
  [g, g-rolled-right] (2CO, lb) accumulated into two (6CI, 2CO) f32
  accumulators across the whole grid (one revisited output block), then a
  tiny XLA post-process reassembles (3, 3, CI, CO);
- conv_p2_train: jax.custom_vjp tying them together (bias grad is an XLA
  reduce).

Gradients are validated against jax autodiff of lax.conv in
tests/test_conv3x3_train.py (interpret mode, f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unetseg_tpu.ops.pallas.conv3x3 import (
    TH,
    WIN,
    _kernel_v2,
    _lane_block,
    _lane_budget,
)


def pack_w_phase2_dx(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, CI, CO) -> (4*CI, 6*CO) for the lanes dx (input-gradient) conv.

    dx(q, i) needs g at lane shifts {0, -1} with spatially-flipped taps:
        dx(0,i) = W0 g(0,i)          + W2 g(0,i-1) + W1 g(1,i-1)
        dx(1,i) = W1 g(0,i) + W0 g(1,i) + W2 g(1,i-1)
    M=(shift s, phase q, ci), K=(ky' = flipped row tap, phase p, co)."""
    ci, co = w_hwio.shape[2], w_hwio.shape[3]
    wf = w_hwio[::-1]  # flip ky: window row ky' pairs w[2-ky']
    z = jnp.zeros_like(wf[:, 0])  # (3, ci, co)
    blk = {
        (0, 0, 0): wf[:, 0], (0, 0, 1): z,
        (0, 1, 0): wf[:, 1], (0, 1, 1): wf[:, 0],
        (1, 0, 0): wf[:, 2], (1, 0, 1): wf[:, 1],
        (1, 1, 0): z,        (1, 1, 1): wf[:, 2],
    }
    rows_out = []
    for s in range(2):
        for q in range(2):
            kb = jnp.stack([blk[(s, q, 0)], blk[(s, q, 1)]], axis=1)
            # (3, 2, ci, co) -> rows are ci, K is (ky, p, co)
            rows_out.append(kb.transpose(2, 0, 1, 3).reshape(ci, 6 * co))
    return jnp.concatenate(rows_out, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "gh_valid", "out_rows", "interpret"),
)
def conv3x3_phase2_dx(g, w_hwio, item_stride: int, gh_valid: int,
                      out_rows: int = 0, interpret: bool = False):
    """Input gradient of the 2-phase lanes conv.

    g: (H_g, 2*CO, L) output gradient, already masked (invalid rows and
    dead tail lanes zeroed) — right-rolls wrap those zeros in as the zero
    padding the full correlation needs. Returns dx (>= max(gh_valid+2,
    out_rows) rows, 2*CI, L); rows past gh_valid+2 are true zeros (computed
    from the zero-padded g), so callers can slice the input-buffer length
    without touching uninitialized memory."""
    hg, co2, lanes = g.shape
    co = co2 // 2
    ci = w_hwio.shape[2]
    ho = max(gh_valid + 2, out_rows)  # dx rows
    nby = -(-ho // TH)
    need = 2 + (nby - 1) * TH + WIN  # +2 top zero rows
    g = jnp.pad(g, ((2, max(0, need - 2 - hg)), (0, 0), (0, 0)))
    isz = g.dtype.itemsize
    bpl = (2 * WIN * co2 + 2 * TH * 2 * ci) * isz + 2 * 2 * ci * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    w_all = pack_w_phase2_dx(w_hwio.astype(g.dtype))
    ones = jnp.ones((2 * ci, 1), jnp.float32)
    zeros = jnp.zeros((2 * ci, 1), jnp.float32)

    def kernel(x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem):
        _kernel_v2(
            x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
            relu=False, lb=lb, ci=co2, co=2 * ci, rows=1,
            nby=nby, nbl=nbl, segs=2, seg_shifts=(0, -1),
        )

    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TH, 2 * ci, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nby * TH + TH, 2 * ci, lanes), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, co2, lb), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g, w_all, ones, zeros)
    return out


def _roll_right(row, shift):
    """Lane right-roll of one (C, lb) window row; pltpu.roll is 32-bit-only
    on this chip, so bf16 rows take an exact f32 roundtrip. The per-block
    wrap matches the global jnp.roll + mask semantics: lane blocks are
    item-aligned and every item keeps >= `shift` masked-zero tail lanes
    (valid cols <= stride - 2 after the conv)."""
    if row.dtype == jnp.float32:
        return pltpu.roll(row, shift, 1)
    return pltpu.roll(row.astype(jnp.float32), shift, 1).astype(row.dtype)


def _kernel_dw(x_ref, g_ref, acc_ref, winx, wing, sems,
               *, lb, cix2, co2, nby, nbl):
    """Accumulate dW lane-contractions: acc[0] += X3 @ g, acc[1] += X3 @ gR
    per output row, into one (2, 3*cix2, co2) f32 block revisited by every
    grid step. gR (g right-rolled one lane) is built in-kernel from the g
    window — the XLA full-tensor roll it replaces cost a read+write of the
    whole gradient per conv backward."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma(ref, win, idx, slot, stp, rows):
        return pltpu.make_async_copy(
            ref.at[pl.ds((stp // nbl) * TH, rows), :,
                   pl.ds((stp % nbl) * lb, lb)],
            win.at[slot],
            sems.at[idx, slot],
        )

    def all2(slot, stp):
        return (
            dma(x_ref, winx, 0, slot, stp, WIN),
            dma(g_ref, wing, 1, slot, stp, TH),
        )

    @pl.when(step == 0)
    def _():
        for d in all2(0, 0):
            d.start()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(step + 1 < nby * nbl)
    def _():
        for d in all2((step + 1) % 2, step + 1):
            d.start()

    for d in all2(step % 2, step):
        d.wait()
    wx = winx.at[step % 2]
    wg = wing.at[step % 2]

    dn = (((1,), (1,)), ((), ()))
    for r in range(TH):
        x3 = wx[r : r + 3].reshape(3 * cix2, lb)
        acc_ref[0] += jax.lax.dot_general(
            x3, wg[r], dn, preferred_element_type=jnp.float32
        )
        acc_ref[1] += jax.lax.dot_general(
            x3, _roll_right(wg[r], 1), dn,
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.jit, static_argnames=("item_stride", "gh_valid", "interpret")
)
def conv3x3_phase2_dw(x, g, item_stride: int, gh_valid: int,
                      interpret: bool = False):
    """Weight gradient of the 2-phase lanes conv.

    x: (H_x, 2*CI, L) the conv input (masked: garbage rows/lanes zeroed);
    g: output gradient masked likewise (its right-rolled copy is built
    in-kernel). Returns dw (3, 3, CI, CO) f32."""
    hx, cix2, lanes = x.shape
    cix = cix2 // 2
    _, co2, _ = g.shape
    co = co2 // 2
    nby = -(-gh_valid // TH)
    need_x = (nby - 1) * TH + WIN
    if need_x > hx:
        x = jnp.pad(x, ((0, need_x - hx), (0, 0), (0, 0)))
    need_g = nby * TH
    if need_g > g.shape[0]:
        g = jnp.pad(g, ((0, need_g - g.shape[0]), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * WIN * cix2 + 2 * TH * co2) * isz
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    kernel = functools.partial(
        _kernel_dw, lb=lb, cix2=cix2, co2=co2, nby=nby, nbl=nbl
    )
    acc = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (2, 3 * cix2, co2), lambda by, bl: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, 3 * cix2, co2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, cix2, lb), x.dtype),
            pltpu.VMEM((2, TH, co2, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(x, g)
    # acc[s][(ky, q, ci), (p, co)] -> dw[ky, kx, ci, co] via the fwd tap
    # table: (p=0,kx)->(q,s) = {0:(0,0), 1:(1,0), 2:(0,1)};
    #        (p=1,kx)->(q,s) = {0:(1,0), 1:(0,1), 2:(1,1)}
    a = acc.reshape(2, 3, 2, cix, 2, co)  # [s, ky, q, ci, p, co]
    dw0 = a[0, :, 0, :, 0] + a[0, :, 1, :, 1]  # kx=0
    dw1 = a[0, :, 1, :, 0] + a[1, :, 0, :, 1]  # kx=1
    dw2 = a[1, :, 0, :, 0] + a[1, :, 1, :, 1]  # kx=2
    return jnp.stack([dw0, dw1, dw2], axis=1)  # (3, 3, ci, co)


# ------------------------------------------------------- dense-layout VJP
def pack_w_dense_dx(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, CI, CO) -> (3*CI, 3*CO) for the DENSE lanes dx conv.

    dx[a, l] = sum_{ky,kx} W[ky,kx]^T g[a-ky, l-kx]: with g zero-padded two
    rows on top, window tap t = 2-ky pairs W[2-t], and the kx taps become
    lane RIGHT-shifts {0,-1,-2} (wrapping masked-zero tail lanes — the zero
    padding of the full correlation). M=(shift s=kx, ci), K=(t, co)."""
    wf = w_hwio[::-1]  # wf[t] = w[2-t]
    ci, co = w_hwio.shape[2], w_hwio.shape[3]
    return wf.transpose(1, 2, 0, 3).reshape(3 * ci, 3 * co)


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "gh_valid", "out_rows", "interpret"),
)
def conv3x3_dense_dx(g, w_hwio, item_stride: int, gh_valid: int,
                     out_rows: int = 0, interpret: bool = False):
    """Input gradient of the dense lanes conv (conv3x3_lanes).

    g: (H_g, CO, L) output gradient, masked (garbage rows and dead tail
    lanes zeroed). Returns dx (>= max(gh_valid+2, out_rows) rows, CI, L);
    rows past gh_valid+2 are true zeros."""
    hg, co, lanes = g.shape
    ci = w_hwio.shape[2]
    ho = max(gh_valid + 2, out_rows)
    nby = -(-ho // TH)
    need = 2 + (nby - 1) * TH + WIN
    g = jnp.pad(g, ((2, max(0, need - 2 - hg)), (0, 0), (0, 0)))
    isz = g.dtype.itemsize
    bpl = (2 * WIN * co + 2 * TH * ci) * isz + 2 * ci * 4
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    w_all = pack_w_dense_dx(w_hwio.astype(g.dtype))
    ones = jnp.ones((ci, 1), jnp.float32)
    zeros = jnp.zeros((ci, 1), jnp.float32)

    def kernel(x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem):
        _kernel_v2(
            x_ref, w_ref, s_ref, b_ref, out_ref, win_ref, sem,
            relu=False, lb=lb, ci=co, co=ci, rows=1,
            nby=nby, nbl=nbl, segs=3, seg_shifts=(0, -1, -2),
        )

    out = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TH, ci, lb), lambda by, bl: (by, 0, bl),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nby * TH + TH, ci, lanes), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, co, lb), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g, w_all, ones, zeros)
    return out


def _kernel_dw_dense(x_ref, g_ref, acc_ref, winx, wing, sems,
                     *, lb, ci, co, nby, nbl):
    """Accumulate dense dW lane-contractions: acc[s] += X3 @ g_rolled_s per
    output row (s = kx tap = lane right-roll of g, built in-kernel), into
    one (3, 3*ci, co) f32 block revisited by every grid step."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma(ref, win, idx, slot, stp, rows):
        return pltpu.make_async_copy(
            ref.at[pl.ds((stp // nbl) * TH, rows), :,
                   pl.ds((stp % nbl) * lb, lb)],
            win.at[slot],
            sems.at[idx, slot],
        )

    def all2(slot, stp):
        return (
            dma(x_ref, winx, 0, slot, stp, WIN),
            dma(g_ref, wing, 1, slot, stp, TH),
        )

    @pl.when(step == 0)
    def _():
        for d in all2(0, 0):
            d.start()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(step + 1 < nby * nbl)
    def _():
        for d in all2((step + 1) % 2, step + 1):
            d.start()

    for d in all2(step % 2, step):
        d.wait()
    wx = winx.at[step % 2]
    wg = wing.at[step % 2]

    dn = (((1,), (1,)), ((), ()))
    for r in range(TH):
        x3 = wx[r : r + 3].reshape(3 * ci, lb)
        for s in range(3):
            gs = wg[r] if s == 0 else _roll_right(wg[r], s)
            acc_ref[s] += jax.lax.dot_general(
                x3, gs, dn, preferred_element_type=jnp.float32
            )


@functools.partial(
    jax.jit, static_argnames=("item_stride", "gh_valid", "interpret")
)
def conv3x3_dense_dw(x, g, item_stride: int, gh_valid: int,
                     interpret: bool = False):
    """Weight gradient of the dense lanes conv.

    x: (H_x, CI, L) conv input (masked); g: output gradient (masked; its
    right-rolled kx-tap copies are built in-kernel). Returns dw
    (3, 3, CI, CO) f32: dW[ky, kx] = sum_{r,j} x[r+ky, j] g[r, j-kx]."""
    hx, ci, lanes = x.shape
    _, co, _ = g.shape
    nby = -(-gh_valid // TH)
    need_x = (nby - 1) * TH + WIN
    if need_x > hx:
        x = jnp.pad(x, ((0, need_x - hx), (0, 0), (0, 0)))
    need_g = nby * TH
    if need_g > g.shape[0]:
        g = jnp.pad(g, ((0, need_g - g.shape[0]), (0, 0), (0, 0)))
    isz = x.dtype.itemsize
    bpl = (2 * WIN * ci + 2 * TH * co) * isz
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    kernel = functools.partial(
        _kernel_dw_dense, lb=lb, ci=ci, co=co, nby=nby, nbl=nbl
    )
    acc = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (3, 3 * ci, co), lambda by, bl: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3 * ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, ci, lb), x.dtype),
            pltpu.VMEM((2, TH, co, lb), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(x, g)
    # acc[kx][(ky, ci), co] -> dw[ky, kx, ci, co]
    return acc.reshape(3, 3, ci, co).transpose(1, 0, 2, 3)


def make_conv_dense_train(item_stride: int, h_valid: int, w_valid: int = 0,
                          interpret: bool = False):
    """Custom-VJP training conv in the DENSE lanes layout (conv3x3_lanes
    forward, Pallas dx/dW backward) for fixed static geometry.

    Returned fn: (x (Hbuf, CI, L) lanes bf16/f32, w (3,3,CI,CO) f32,
    b (CO,) f32) -> z (raw-rows buffer, CO, L). `w_valid` defaults to
    h_valid (square tiles)."""
    from unetseg_tpu.ops.pallas.conv3x3 import conv3x3_lanes

    wv = w_valid or h_valid
    ho = h_valid - 2

    @jax.custom_vjp
    def conv(x, w, b):
        return conv3x3_lanes(
            x, w, jnp.ones((w.shape[3], 1), jnp.float32), b.reshape(-1, 1),
            item_stride, relu=False, interpret=interpret,
            h_valid=h_valid, raw_rows=True,
        )

    def fwd(x, w, b):
        return conv(x, w, b), (x, w)

    def _mask(t, rows_valid, cols_valid):
        """Zero garbage rows and dead tail lanes of a dense lanes tensor."""
        n_items = t.shape[2] // item_stride
        lane_ids = jnp.arange(item_stride)
        lm = jnp.tile(lane_ids < cols_valid, n_items)
        rm = jnp.arange(t.shape[0]) < rows_valid
        # where, not multiply: garbage can be NaN and NaN * 0 == NaN
        return jnp.where(rm[:, None, None] & lm[None, None, :], t, 0)

    def bwd(res, g):
        x, w = res
        gm = _mask(g, ho, wv - 2)
        xm = _mask(x, h_valid, wv)
        dx = conv3x3_dense_dx(
            gm, w, item_stride, gh_valid=ho, out_rows=x.shape[0],
            interpret=interpret,
        )[: x.shape[0]]
        dw = conv3x3_dense_dw(
            xm, gm, item_stride, gh_valid=ho, interpret=interpret
        )
        db = jnp.sum(gm, axis=(0, 2), dtype=jnp.float32)
        return dx, dw.astype(w.dtype), db.astype(jnp.float32)

    conv.defvjp(fwd, bwd)
    return conv


def make_conv_p2_train(item_stride: int, h_valid: int, interpret: bool = False):
    """Build the custom-VJP training conv for fixed static geometry.

    Returned fn: (x (Hbuf, 2*CI, L) lanes bf16/f32, w (3,3,CI,CO) f32,
    b (CO,) f32) -> z (raw-rows buffer, 2*CO, L). Gradient flows to x, w, b.
    """
    from unetseg_tpu.ops.pallas.conv3x3 import conv3x3_phase2

    # square tensors assumed (tiles): h_valid doubles as the valid width
    ho = h_valid - 2

    @jax.custom_vjp
    def conv(x, w, b):
        return conv3x3_phase2(
            x, w, jnp.ones((w.shape[3], 1), jnp.float32), b.reshape(-1, 1),
            item_stride, relu=False, interpret=interpret,
            h_valid=h_valid, raw_rows=True,
        )

    def fwd(x, w, b):
        return conv(x, w, b), (x, w)

    def _mask(t, nch, rows_valid, w_valid):
        """Zero garbage rows and dead tail lanes of a (H, 2*nch, L) lanes
        tensor (phase 0 keeps ceil(w/2) lanes, phase 1 floor(w/2))."""
        n_items = t.shape[2] // item_stride
        lane_ids = jnp.arange(item_stride)
        m0 = jnp.tile((lane_ids < -(-w_valid // 2)).astype(t.dtype), n_items)
        m1 = jnp.tile((lane_ids < w_valid // 2).astype(t.dtype), n_items)
        rmask = jnp.arange(t.shape[0]) < rows_valid
        lmask = jnp.concatenate(
            [jnp.broadcast_to(m0 > 0, (nch, t.shape[2])),
             jnp.broadcast_to(m1 > 0, (nch, t.shape[2]))], axis=0
        )
        # where, not multiply: garbage can be NaN (uninitialized spare
        # blocks) and NaN * 0 == NaN
        return jnp.where(rmask[:, None, None] & lmask[None], t, 0)

    def bwd(res, g):
        x, w = res
        ci, co = w.shape[2], w.shape[3]
        # static masks: rolls and lane contractions then see true zero
        # padding (garbage rows/lanes may be uninitialized memory — NaN*0
        # would poison dW, so x is masked too)
        gm = _mask(g, co, ho, h_valid - 2)
        xm = _mask(x, ci, h_valid, h_valid)
        dx = conv3x3_phase2_dx(
            gm, w, item_stride, gh_valid=ho, out_rows=x.shape[0],
            interpret=interpret,
        )[: x.shape[0]]
        dw = conv3x3_phase2_dw(
            xm, gm, item_stride, gh_valid=ho, interpret=interpret
        )
        db = jnp.sum(gm, axis=(0, 2), dtype=jnp.float32)
        db = db[:co] + db[co:]
        return dx, dw.astype(w.dtype), db.astype(jnp.float32)

    conv.defvjp(fwd, bwd)
    return conv


# ------------------------------------------------ fused decoder-entry VJP
def _dw_acc_reassemble(acc, cix, co):
    """(2, 3*2*cix, 2*co) phase2 dW accumulators -> (3, 3, cix, co) via the
    forward tap table (shared by conv3x3_phase2_dw and the dec0 dW)."""
    a = acc.reshape(2, 3, 2, cix, 2, co)  # [s, ky, q, ci, p, co]
    dw0 = a[0, :, 0, :, 0] + a[0, :, 1, :, 1]  # kx=0
    dw1 = a[0, :, 1, :, 0] + a[1, :, 0, :, 1]  # kx=1
    dw2 = a[1, :, 0, :, 0] + a[1, :, 1, :, 1]  # kx=2
    return jnp.stack([dw0, dw1, dw2], axis=1)  # (3, 3, ci, co)


def _kernel_dw_dec0(skip_ref, up_ref, g_ref, accs_ref, accu_ref,
                    wins, winu, wing, shift_buf, sems,
                    *, lb, cis2, ciu2, co2, nby, nbl, row_off, lane_off):
    """dW of the decoder-entry conv (conv over concat(crop(skip), up))
    WITHOUT materializing the crop or the concat: the skip window DMAs at
    the static row offset and its lanes shift left by `lane_off` in-kernel
    (f32 upcast -> pltpu.roll -> downcast; rolls are 32-bit-only on this
    chip). Wrapped garbage lanes multiply the masked-zero tail lanes of g.
    accs/accu are (2, 3*cis2|3*ciu2, co2) f32 blocks revisited by every
    grid step (same accumulate-in-place protocol as _kernel_dw)."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma(ref, win, idx, slot, stp, rows, roff=0):
        return pltpu.make_async_copy(
            ref.at[pl.ds(roff + (stp // nbl) * TH, rows), :,
                   pl.ds((stp % nbl) * lb, lb)],
            win.at[slot],
            sems.at[idx, slot],
        )

    def all3(slot, stp):
        return (
            dma(skip_ref, wins, 0, slot, stp, WIN, roff=row_off),
            dma(up_ref, winu, 1, slot, stp, WIN),
            dma(g_ref, wing, 2, slot, stp, TH),
        )

    @pl.when(step == 0)
    def _():
        for d in all3(0, 0):
            d.start()
        accs_ref[...] = jnp.zeros_like(accs_ref)
        accu_ref[...] = jnp.zeros_like(accu_ref)

    @pl.when(step + 1 < nby * nbl)
    def _():
        for d in all3((step + 1) % 2, step + 1):
            d.start()

    for d in all3(step % 2, step):
        d.wait()
    ws = wins.at[step % 2]
    wu = winu.at[step % 2]
    wg = wing.at[step % 2]

    # shift the skip window's lanes left by lane_off once per grid step
    # (the crop's column offset; the f32 roundtrip is exact for bf16)
    for r in range(WIN):
        row = ws[r].astype(jnp.float32)
        shift_buf[r] = pltpu.roll(row, (lb - lane_off) % lb, 1).astype(
            shift_buf.dtype
        )

    dn = (((1,), (1,)), ((), ()))
    for r in range(TH):
        xs3 = shift_buf[r : r + 3].reshape(3 * cis2, lb)
        xu3 = wu[r : r + 3].reshape(3 * ciu2, lb)
        gr_row = _roll_right(wg[r], 1)
        accs_ref[0] += jax.lax.dot_general(
            xs3, wg[r], dn, preferred_element_type=jnp.float32
        )
        accs_ref[1] += jax.lax.dot_general(
            xs3, gr_row, dn, preferred_element_type=jnp.float32
        )
        accu_ref[0] += jax.lax.dot_general(
            xu3, wg[r], dn, preferred_element_type=jnp.float32
        )
        accu_ref[1] += jax.lax.dot_general(
            xu3, gr_row, dn, preferred_element_type=jnp.float32
        )


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "gh_valid", "row_off", "lane_off",
                     "interpret"),
)
def conv3x3_dec0_dw(skip, up, g, item_stride: int, gh_valid: int,
                    row_off: int, lane_off: int, interpret: bool = False):
    """Weight gradient of the fused decoder-entry conv.

    skip: (H_s, 2*CI_s, L) 2-phase, RAW (windows read only real cropped
    rows; wrapped shift garbage meets masked-zero g lanes); up: (H_u,
    2*CI_u, L) masked (garbage rows/lanes zeroed); g: output grad masked
    (right-rolled copy built in-kernel). Returns dw (3, 3, CI_s + CI_u,
    CO) f32, skip channels first (the trained concat-conv order)."""
    _, cis2, lanes = skip.shape
    _, ciu2, _ = up.shape
    cis, ciu = cis2 // 2, ciu2 // 2
    _, co2, _ = g.shape
    co = co2 // 2
    nby = -(-gh_valid // TH)
    need_s = row_off + (nby - 1) * TH + WIN
    if need_s > skip.shape[0]:
        skip = jnp.pad(skip, ((0, need_s - skip.shape[0]), (0, 0), (0, 0)))
    need_u = (nby - 1) * TH + WIN
    if need_u > up.shape[0]:
        up = jnp.pad(up, ((0, need_u - up.shape[0]), (0, 0), (0, 0)))
    need_g = nby * TH
    if need_g > g.shape[0]:
        g = jnp.pad(g, ((0, need_g - g.shape[0]), (0, 0), (0, 0)))
    isz = skip.dtype.itemsize
    bpl = (3 * WIN * cis2 + 2 * WIN * ciu2 + 2 * TH * co2) * isz
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    kernel = functools.partial(
        _kernel_dw_dec0, lb=lb, cis2=cis2, ciu2=ciu2, co2=co2,
        nby=nby, nbl=nbl, row_off=row_off, lane_off=lane_off,
    )
    accs, accu = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=(
            pl.BlockSpec(
                (2, 3 * cis2, co2), lambda by, bl: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, 3 * ciu2, co2), lambda by, bl: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, 3 * cis2, co2), jnp.float32),
            jax.ShapeDtypeStruct((2, 3 * ciu2, co2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, cis2, lb), skip.dtype),
            pltpu.VMEM((2, WIN, ciu2, lb), up.dtype),
            pltpu.VMEM((2, TH, co2, lb), g.dtype),
            pltpu.VMEM((WIN, cis2, lb), skip.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        interpret=interpret,
    )(skip, up, g)
    dw_s = _dw_acc_reassemble(accs, cis, co)
    dw_u = _dw_acc_reassemble(accu, ciu, co)
    return jnp.concatenate([dw_s, dw_u], axis=2)


def make_dec0_p2_train(item_stride: int, up_w: int, row_off: int,
                       lane_off: int, skip_rows_valid: int = 0,
                       interpret: bool = False):
    """Custom-VJP training conv for the decoder ENTRY: 3x3 VALID over
    concat(center-crop(skip), up) with the crop folded into the kernels'
    DMA offsets + lane rolls — neither the crop nor the concat is ever
    materialized (the XLA roll+concat glue cost ~3.4 ms/step, the measured
    reason tier-2 lost to tier-1; docs/ROADMAP.md #14).

    Returned fn: (skip (H_s, 2*CI_s, L) 2-phase lanes, up (H_u, 2*CI_u, L),
    w (3, 3, CI_s+CI_u, CO) f32 — skip channels first, b (CO,)) ->
    z (raw-rows buffer, 2*CO, L) at the UP geometry (valid rows up_w - 2).
    Gradients flow to all four; d_skip scatters back to the skip frame
    (zeros outside the crop). reference: models/unet_model.py:23-46 (Up:
    crop+concat+DoubleConv) is the module this trains."""
    from unetseg_tpu.ops.pallas.conv3x3 import dec_conv0_phase2

    ho = up_w - 2
    # dW windows read skip rows [row_off, row_off + (ceil(ho/8)-1)*8 + 10);
    # rows beyond the caller's valid region can be raw-rows NaN garbage
    # that poisons the accumulators through NaN*0 — mask only when the
    # window actually reaches them (never at the 512/700 geometries)
    need_s = row_off + (-(-ho // TH) - 1) * TH + WIN
    mask_skip = bool(skip_rows_valid) and need_s > skip_rows_valid

    @jax.custom_vjp
    def conv(skip, up, w, b):
        co = w.shape[3]
        return dec_conv0_phase2(
            skip, up, w, jnp.ones((co, 1), jnp.float32), b.reshape(-1, 1),
            item_stride, out_rows=ho, row_off=row_off, lane_off=lane_off,
            relu=False, interpret=interpret, raw_rows=True, unit_scale=True,
        )

    def fwd(skip, up, w, b):
        return conv(skip, up, w, b), (skip, up, w)

    def _mask_p2(t, nch, rows_valid, w_valid):
        n_items = t.shape[2] // item_stride
        lane_ids = jnp.arange(item_stride)
        m0 = jnp.tile(lane_ids < -(-w_valid // 2), n_items)
        m1 = jnp.tile(lane_ids < w_valid // 2, n_items)
        rmask = jnp.arange(t.shape[0]) < rows_valid
        lmask = jnp.concatenate(
            [jnp.broadcast_to(m0, (nch, t.shape[2])),
             jnp.broadcast_to(m1, (nch, t.shape[2]))], axis=0
        )
        return jnp.where(rmask[:, None, None] & lmask[None], t, 0)

    def bwd(res, g):
        skip, up, w = res
        cis = skip.shape[1] // 2
        ciu = up.shape[1] // 2
        co = w.shape[3]
        gm = _mask_p2(g, co, ho, ho)
        # up garbage rows (raw-rows tconv buffers) can be uninitialized —
        # mask them; the skip is real data everywhere its windows read
        um = _mask_p2(up, ciu, up_w, up_w)
        sm = (
            jnp.where(
                (jnp.arange(skip.shape[0]) < skip_rows_valid)[:, None, None],
                skip, 0,
            )
            if mask_skip
            else skip
        )
        dcat = conv3x3_phase2_dx(
            gm, w, item_stride, gh_valid=ho, out_rows=0,
            interpret=interpret,
        )[:up_w]
        # cat channel layout: [crop_p0 (cis), up_p0 (ciu), crop_p1, up_p1]
        d_crop = jnp.concatenate(
            [dcat[:, :cis], dcat[:, cis + ciu : 2 * cis + ciu]], axis=1
        )
        d_up = jnp.concatenate(
            [dcat[:, cis : cis + ciu], dcat[:, 2 * cis + ciu :]], axis=1
        )
        if d_up.shape[0] < up.shape[0]:
            d_up = jnp.pad(
                d_up, ((0, up.shape[0] - d_up.shape[0]), (0, 0), (0, 0))
            )
        else:
            d_up = d_up[: up.shape[0]]
        # scatter the crop gradient back into the skip frame: lanes roll
        # right by lane_off, rows land at [row_off, row_off + up_w)
        d_skip = jnp.roll(d_crop, lane_off, axis=2)
        d_skip = jnp.pad(
            d_skip,
            ((row_off, max(0, skip.shape[0] - row_off - d_skip.shape[0])),
             (0, 0), (0, 0)),
        )[: skip.shape[0]]
        dw = conv3x3_dec0_dw(
            sm, um, gm, item_stride, gh_valid=ho,
            row_off=row_off, lane_off=lane_off, interpret=interpret,
        )
        db = jnp.sum(gm, axis=(0, 2), dtype=jnp.float32)
        db = db[:co] + db[co:]
        return d_skip, d_up, dw.astype(w.dtype), db.astype(jnp.float32)

    conv.defvjp(fwd, bwd)
    return conv


def _kernel_dw_dec0_dense(skip_ref, up_ref, g_ref,
                          accs_ref, accu_ref, wins, winu, wing,
                          shift_buf, sems, *, lb, cis, ciu, co,
                          nby, nbl, row_off, lane_off):
    """Dense-layout dW of the decoder-entry conv (see _kernel_dw_dec0 for
    the shift/garbage argument; dense = 3 kx g-rolls, built in-kernel)."""
    by = pl.program_id(0)
    bl = pl.program_id(1)
    step = by * nbl + bl

    def dma(ref, win, idx, slot, stp, rows, roff=0):
        return pltpu.make_async_copy(
            ref.at[pl.ds(roff + (stp // nbl) * TH, rows), :,
                   pl.ds((stp % nbl) * lb, lb)],
            win.at[slot],
            sems.at[idx, slot],
        )

    def all3(slot, stp):
        return (
            dma(skip_ref, wins, 0, slot, stp, WIN, roff=row_off),
            dma(up_ref, winu, 1, slot, stp, WIN),
            dma(g_ref, wing, 2, slot, stp, TH),
        )

    @pl.when(step == 0)
    def _():
        for d in all3(0, 0):
            d.start()
        accs_ref[...] = jnp.zeros_like(accs_ref)
        accu_ref[...] = jnp.zeros_like(accu_ref)

    @pl.when(step + 1 < nby * nbl)
    def _():
        for d in all3((step + 1) % 2, step + 1):
            d.start()

    for d in all3(step % 2, step):
        d.wait()
    ws = wins.at[step % 2]
    wu = winu.at[step % 2]
    wg = wing.at[step % 2]

    for r in range(WIN):
        row = ws[r].astype(jnp.float32)
        shift_buf[r] = pltpu.roll(row, (lb - lane_off) % lb, 1).astype(
            shift_buf.dtype
        )

    dn = (((1,), (1,)), ((), ()))
    for r in range(TH):
        xs3 = shift_buf[r : r + 3].reshape(3 * cis, lb)
        xu3 = wu[r : r + 3].reshape(3 * ciu, lb)
        for s in range(3):
            gs = wg[r] if s == 0 else _roll_right(wg[r], s)
            accs_ref[s] += jax.lax.dot_general(
                xs3, gs, dn, preferred_element_type=jnp.float32
            )
            accu_ref[s] += jax.lax.dot_general(
                xu3, gs, dn, preferred_element_type=jnp.float32
            )


@functools.partial(
    jax.jit,
    static_argnames=("item_stride", "gh_valid", "row_off", "lane_off",
                     "interpret"),
)
def conv3x3_dec0_dense_dw(skip, up, g, item_stride: int,
                          gh_valid: int, row_off: int, lane_off: int,
                          interpret: bool = False):
    """Weight gradient of the fused DENSE decoder-entry conv. skip raw,
    up/g masked (g's kx-tap right-rolls built in-kernel). Returns
    (3, 3, CI_s+CI_u, CO) f32, skip channels first."""
    _, cis, lanes = skip.shape
    _, ciu, _ = up.shape
    _, co, _ = g.shape
    nby = -(-gh_valid // TH)
    need_s = row_off + (nby - 1) * TH + WIN
    if need_s > skip.shape[0]:
        skip = jnp.pad(skip, ((0, need_s - skip.shape[0]), (0, 0), (0, 0)))
    need_u = (nby - 1) * TH + WIN
    if need_u > up.shape[0]:
        up = jnp.pad(up, ((0, need_u - up.shape[0]), (0, 0), (0, 0)))
    need_g = nby * TH
    if need_g > g.shape[0]:
        g = jnp.pad(g, ((0, need_g - g.shape[0]), (0, 0), (0, 0)))
    isz = skip.dtype.itemsize
    bpl = (3 * WIN * cis + 2 * WIN * ciu + 2 * TH * co) * isz
    lb = _lane_block(lanes, item_stride, _lane_budget(bpl))
    nbl = lanes // lb

    kernel = functools.partial(
        _kernel_dw_dec0_dense, lb=lb, cis=cis, ciu=ciu, co=co,
        nby=nby, nbl=nbl, row_off=row_off, lane_off=lane_off,
    )
    accs, accu = pl.pallas_call(
        kernel,
        grid=(nby, nbl),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=(
            pl.BlockSpec(
                (3, 3 * cis, co), lambda by, bl: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * ciu, co), lambda by, bl: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, 3 * cis, co), jnp.float32),
            jax.ShapeDtypeStruct((3, 3 * ciu, co), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, cis, lb), skip.dtype),
            pltpu.VMEM((2, WIN, ciu, lb), up.dtype),
            pltpu.VMEM((2, TH, co, lb), g.dtype),
            pltpu.VMEM((WIN, cis, lb), skip.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        interpret=interpret,
    )(skip, up, g)
    dw_s = accs.reshape(3, 3, cis, co).transpose(1, 0, 2, 3)
    dw_u = accu.reshape(3, 3, ciu, co).transpose(1, 0, 2, 3)
    return jnp.concatenate([dw_s, dw_u], axis=2)


def make_dec0_dense_train(item_stride: int, up_w: int, row_off: int,
                          lane_off: int, skip_rows_valid: int = 0,
                          skip_w_valid: int = 0, up_rows_valid: int = 0,
                          interpret: bool = False):
    """Custom-VJP training conv for a DENSE-layout decoder entry (tier-2
    dec2): conv3x3(concat(crop(skip), up)) with the crop folded into the
    kernels — the dense counterpart of make_dec0_p2_train. `up_rows_valid`
    defaults to up_w (tconv raw-rows buffers); `skip_w_valid` bounds the
    skip's real columns for the backward masks."""
    from unetseg_tpu.ops.pallas.conv3x3 import dec_conv0_lanes

    ho = up_w - 2
    urv = up_rows_valid or up_w
    need_s = row_off + (-(-ho // TH) - 1) * TH + WIN
    mask_skip = bool(skip_rows_valid) and need_s > skip_rows_valid

    @jax.custom_vjp
    def conv(skip, up, w, b):
        co = w.shape[3]
        return dec_conv0_lanes(
            skip, up, w, jnp.ones((co, 1), jnp.float32), b.reshape(-1, 1),
            item_stride, out_rows=ho, row_off=row_off, lane_off=lane_off,
            relu=False, interpret=interpret, raw_rows=True,
        )

    def fwd(skip, up, w, b):
        return conv(skip, up, w, b), (skip, up, w)

    def _mask_dense(t, rows_valid, cols_valid):
        n_items = t.shape[2] // item_stride
        lm = jnp.tile(jnp.arange(item_stride) < cols_valid, n_items)
        rm = jnp.arange(t.shape[0]) < rows_valid
        return jnp.where(rm[:, None, None] & lm[None, None, :], t, 0)

    def bwd(res, g):
        skip, up, w = res
        cis = skip.shape[1]
        co = w.shape[3]
        gm = _mask_dense(g, ho, up_w - 2)
        um = _mask_dense(up, urv, up_w)
        sm = skip
        if mask_skip:
            sm = jnp.where(
                (jnp.arange(sm.shape[0]) < skip_rows_valid)[:, None, None],
                sm, 0,
            )
        if skip_w_valid:
            # fence non-finite garbage columns out of the dW contraction
            n_items = sm.shape[2] // item_stride
            lm = jnp.tile(jnp.arange(item_stride) < skip_w_valid, n_items)
            sm = jnp.where(lm[None, None, :], sm, 0)
        dcat = conv3x3_dense_dx(
            gm, w, item_stride, gh_valid=ho, out_rows=0, interpret=interpret,
        )[:up_w]
        d_crop, d_up = dcat[:, :cis], dcat[:, cis:]
        if d_up.shape[0] < up.shape[0]:
            d_up = jnp.pad(
                d_up, ((0, up.shape[0] - d_up.shape[0]), (0, 0), (0, 0))
            )
        else:
            d_up = d_up[: up.shape[0]]
        d_skip = jnp.roll(d_crop, lane_off, axis=2)
        d_skip = jnp.pad(
            d_skip,
            ((row_off, max(0, skip.shape[0] - row_off - d_skip.shape[0])),
             (0, 0), (0, 0)),
        )[: skip.shape[0]]
        dw = conv3x3_dec0_dense_dw(
            sm, um, gm, item_stride, gh_valid=ho,
            row_off=row_off, lane_off=lane_off, interpret=interpret,
        )
        db = jnp.sum(gm, axis=(0, 2), dtype=jnp.float32)
        return d_skip, d_up, dw.astype(w.dtype), db.astype(jnp.float32)

    conv.defvjp(fwd, bwd)
    return conv
