"""Blocked NHWC 3x3 conv with in-VMEM im2col (the "cblock" kernel).

VERDICT-r4 item 1: the middle NHWC stages (enc1/enc2/dec1/dec2 at
254-344 px, 128-512 ch) run at 58-110 TF/s under XLA's conv lowering vs
the ~190 TF/s the deep stages reach, and three alternatives are measured
negatives (spatial pre-pad, XLA-level dot9, the dense-lanes tier-2 region
— docs/ROADMAP.md items 31/34). This kernel is the remaining untried
formulation: keep the tensor in its native NHWC layout (C = lane dim, so
it composes with the XLA middle with ZERO layout handoffs — the failure
mode that sank tier-2) and build the 3x3 window expansion INSIDE VMEM:

    per (batch, 8-row block):
      window DMA (10, W', CI) HBM -> VMEM   (double-buffered across steps)
      im2col    (8, W2, 9*CI)               (9 statically-shifted copies)
      ONE dot   (8*W2, 9*CI) @ (9*CI, CO)   (M~2.8k, K~1.2k: exact MXU shape)
      bias + ReLU epilogue, bf16 store

The XLA-level dot9 negative (10-17 TF/s) was the same math with the
slice/accumulate chain materialized through HBM; here the expansion lives
and dies in VMEM. The known risk is VPU bandwidth on the 9x window
re-copy (~2.8 TB/s demand at the enc1 shape) — tools/kbench_cblock.py
measures it per stage against XLA's in-context numbers.

Constraints: CO a multiple of 128 (asserted); CI is zero-padded to a lane
multiple internally. The staged input width is W2 + 2 rounded up to the
next sublane multiple — a Mosaic memref_slice rule: even a full-extent
window-DMA slice must be 8-aligned along the sublane (W) dim — and the
kernel reads only the first W2 + 2 staged columns. Rows are padded to the
block grid internally; garbage tail rows flow out and are sliced off,
same protocol as conv3x3.py. reference: models/unet_model.py:23-33 (the
conv stages this accelerates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8   # output rows per grid step
WIN = TH + 2


def pack_w_cblock(w_hwio: jnp.ndarray, ci_pad: int = 0) -> jnp.ndarray:
    """(3, 3, CI, CO) -> (9*CIp, CO) matching the im2col tap order
    (dy-major, dx-minor), with optional CI zero-padding to CIp."""
    kh, kw, ci, co = w_hwio.shape
    assert kh == 3 and kw == 3
    cip = ci_pad or ci
    if cip != ci:
        w_hwio = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, cip - ci), (0, 0)))
    return w_hwio.reshape(9 * cip, co)


def _kernel_cblock(x_ref, w_ref, b_ref, out_ref, win_ref, bt_ref, sem,
                   *, relu, ci, co, w2, nby, nb, mode):
    bi = pl.program_id(0)
    by = pl.program_id(1)
    step = bi * nby + by

    def dma(slot, stp):
        return pltpu.make_async_copy(
            x_ref.at[stp // nby, pl.ds((stp % nby) * TH, WIN), :, :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    @pl.when(step + 1 < nb * nby)
    def _():
        dma((step + 1) % 2, step + 1).start()

    dma(step % 2, step).wait()
    win = win_ref.at[step % 2]

    if mode == "im2col":
        # im2col: bt[r, x, (3*dy+dx)*CI + c] = win[r+dy, x+dx, c].
        # Static row offsets, static sublane (W) shifts, lane offsets at
        # CI multiples of 128 — every store is tile-aligned.
        for dy in range(3):
            for dx in range(3):
                t = 3 * dy + dx
                bt_ref[:, :, t * ci:(t + 1) * ci] = (
                    win[dy:dy + TH, dx:dx + w2, :])

        # one MXU dot for the whole block: (TH*W2, 9*CI) @ (9*CI, CO)
        acc = jnp.dot(
            bt_ref[:].reshape(TH * w2, 9 * ci), w_ref[:],
            preferred_element_type=jnp.float32,
        )
    else:
        # dots9: 9 accumulating (TH*W2, CI) @ (CI, CO) dots straight off
        # the window buffer — no im2col materialization, saving the
        # 2x(9*CI) VMEM round-trip that binds the im2col mode. The dx
        # shifts are unaligned sublane loads (relayout cost only).
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = 3 * dy + dx
                part = jnp.dot(
                    win[dy:dy + TH, dx:dx + w2, :].reshape(TH * w2, ci),
                    w_ref[t * ci:(t + 1) * ci, :],
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
    acc = acc + b_ref[:]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(TH, w2, co).astype(out_ref.dtype)


def conv3x3_cblock(x, w_hwio, bias, relu: bool = True,
                   interpret: bool = False, mode: str = "im2col"):
    """Fused VALID 3x3 conv + bias + ReLU on an NHWC tensor.

    x:      (B, H, W, CI) bf16/f32. CI is zero-padded to a lane multiple
            internally when needed; H/W are padded internally (VALID
            semantics preserved — the pads only feed garbage tail outputs
            that are sliced off).
    w_hwio: (3, 3, CI, CO) kernel; CO must be a multiple of 128.
    bias:   (CO,) f32.
    mode:   "im2col" (one big dot off a materialized 9*CI block) or
            "dots9" (9 accumulating dots off the window buffer).
    Returns (B, H-2, W-2, CO) in x.dtype.
    """
    b, h, w, ci = x.shape
    co = w_hwio.shape[3]
    assert co % 128 == 0, f"CO {co} must be lane-aligned"
    cip = -(-ci // 128) * 128
    if cip != ci:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cip - ci)))
    w2 = -(-(w - 2) // 8) * 8          # padded out width (sublane multiple)
    # The window DMA source slice must be 8-aligned along the sublane (W)
    # dim even when "full" (Mosaic memref_slice rule), so the staged input
    # width is w2+2 rounded up to the next sublane multiple; the kernel
    # only reads columns [0, w2+2) of the window buffer.
    wp = -(-(w2 + 2) // 8) * 8
    nby = -(-(h - 2) // TH)
    hp = (nby - 1) * TH + WIN          # input rows the last window reads
    if wp != w or hp > h:
        x = jnp.pad(x, ((0, 0), (0, max(0, hp - h)), (0, max(0, wp - w)),
                        (0, 0)))
    x = x[:, :hp, :wp]

    w_all = pack_w_cblock(w_hwio, ci_pad=cip).astype(x.dtype)
    b_row = bias.reshape(1, co).astype(jnp.float32)

    kernel = functools.partial(
        _kernel_cblock, relu=relu, ci=cip, co=co, w2=w2, nby=nby, nb=b,
        mode=mode,
    )
    # dots9 never touches bt; shrink its scratch to one tile.
    bt_shape = (TH, w2, 9 * cip) if mode == "im2col" else (8, 1, 128)
    out = pl.pallas_call(
        kernel,
        grid=(b, nby),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias row
        ],
        out_specs=pl.BlockSpec(
            (1, TH, w2, co), lambda bi, by: (bi, by, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nby * TH, w2, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, wp, cip), x.dtype),  # window double buffer
            pltpu.VMEM(bt_shape, x.dtype),           # im2col block
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w_all, b_row)
    return out[:, : h - 2, : w - 2]
