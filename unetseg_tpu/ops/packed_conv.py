"""Width-packed 3x3 valid convolution — full MXU lanes for narrow channels.

TPU vector lanes are 128 wide; the U-Net's 64-channel stages (enc0, dec3)
run convs at ~43 TFLOP/s vs ~127 TFLOP/s for >=128-channel stages (half the
pipeline time at 1/3 the rate — see docs/PARITY.md 'Known headroom').

The transform: pack two horizontally adjacent pixels' channels into one
vector, X_p[u] = concat(X[2u], X[2u+1]) — (B, H, W, C) -> (B, H, W/2, 2C) —
and rewrite the 3x3 valid conv as a 3x2 valid conv over packed pixels whose
(2C_in, 2C_out) kernel scatters the original taps:

  out fine pixel p = 2u + b needs fine columns p..p+2 = 2(u + kw) + ci_blk
  =>  P[kv, kw, ci_blk*C+ci, b*C+co] = K[kv, dx, ci, co]
      where dx = 2*kw + ci_blk - b, kept iff 0 <= dx <= 2.

FLOPs grow 4/3 (2x2x(2C)^2 vs 9C^2 per two outputs... net 24C^2 vs 18C^2 per
fine pixel) but run at the full-lane rate, a ~2x win for C=64. The result is
bit-identical to the unpacked conv (same dtype, same contraction order up to
reassociation); tests assert equality to fp32 tolerance.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pack_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W//2, 2C); W must be even."""
    b, h, w, c = x.shape
    assert w % 2 == 0, f"width {w} must be even to pack"
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, Wp, 2C) -> (B, H, 2*Wp, C)."""
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, wp * 2, c2 // 2)


def pack_kernel_3x3(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (3, 2, 2Cin, 2Cout) packed kernel."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    packed = jnp.zeros((3, 2, 2 * cin, 2 * cout), kernel.dtype)
    for kw_p in range(2):
        for ci_blk in range(2):
            for b_out in range(2):
                dx = 2 * kw_p + ci_blk - b_out
                if 0 <= dx <= 2:
                    packed = packed.at[
                        :, kw_p,
                        ci_blk * cin : (ci_blk + 1) * cin,
                        b_out * cout : (b_out + 1) * cout,
                    ].set(kernel[:, dx, :, :])
    return packed


def packed_conv3x3_valid(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray
) -> jnp.ndarray:
    """3x3 VALID conv computed in width-packed form. x (B, H, W, Cin) with W
    even; returns (B, H-2, W-2, Cout), identical to the direct conv."""
    cout = kernel.shape[-1]
    xp = pack_width(x)
    kp = pack_kernel_3x3(kernel).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(xp.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
    yp = jax.lax.conv_general_dilated(
        xp, kp, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=x.dtype,
    )
    y = unpack_width(yp)  # (B, H-2, W-2, Cout)
    return y + bias.astype(x.dtype)


def should_pack(w: int, cout: int, cin: int) -> bool:
    """Pack when the output channel dim underfills the 128 lanes and the
    geometry allows it."""
    return w % 2 == 0 and w >= 4 and cout <= 64 and 2 * cin <= 1024
