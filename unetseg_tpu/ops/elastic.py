"""On-device elastic deformation.

The reference deforms on the host per item with scipy — random uniform fields
-> gaussian_filter(sigma, mode='constant') -> x alpha -> map_coordinates
(order=1/bilinear for the image, order=0/nearest for the mask, mode='reflect')
(reference: utils/augmentations.py:4-39, defaults alpha=2000 sigma=20 from
scripts/train.py:35-36). That host loop dominates the reference's training
wall-clock (SURVEY.md §3.1 'HOT (CPU)').

Here the whole thing is a jit-compiled displacement-field gather that runs
inside the training step on device: the Gaussian blur is two separable 1D
convolutions, sampling uses jax.scipy.ndimage.map_coordinates with the same
order/mode semantics, and randomness is a `jax.random` key, so augmentation is
deterministic per (key, item) and costs no host<->device transfer.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _gaussian_kernel1d_np(sigma: float, truncate: float = 4.0):
    """Host-side (numpy) discrete Gaussian identical to
    scipy.ndimage.gaussian_filter1d's (order 0): radius =
    int(truncate * sigma + 0.5), normalized to sum 1. Single source of truth
    for both the jnp helper and the band matrix so the radius rule /
    normalization / dtype cannot drift apart."""
    import numpy as np

    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32), radius


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Device view of the scipy-matched Gaussian (see _gaussian_kernel1d_np)."""
    k, _ = _gaussian_kernel1d_np(sigma, truncate)
    return jnp.asarray(k)


def blur_band_matrix(size: int, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """(size, size) banded matrix B with B[i, j] = gauss(j - i): B @ x blurs a
    length-`size` signal with zero ('constant') boundary — rows near the edge
    simply truncate, which is exactly scipy's mode='constant', cval=0.

    Built in numpy on the host: every argument is static, so the matrix is a
    trace-time constant. Building it with jnp ops instead put a size² gather
    from the kernel taps INSIDE the train step (too big for XLA's constant
    folder), measured ~2 ms per augmented step rebuilt every iteration."""
    import numpy as np

    k, r = _gaussian_kernel1d_np(sigma, truncate)
    i = np.arange(size)
    d = i[None, :] - i[:, None] + r  # kernel tap index of column j for row i
    valid = (d >= 0) & (d < k.shape[0])
    band = np.where(valid, k[np.clip(d, 0, k.shape[0] - 1)], np.float32(0.0))
    return jnp.asarray(band, dtype=jnp.float32)


def gaussian_blur_2d(
    img: jnp.ndarray, sigma: float, truncate: float = 4.0
) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) array, zero ('constant') boundary —
    matches scipy gaussian_filter(mode='constant', cval=0).

    TPU note: a single-channel conv would use 1/128 of the vector lanes, and
    at sigma=20 the kernel has 161 taps — convolution form measured ~88 ms
    per train batch. The blur is instead computed as two dense banded
    matmuls, B_h @ img @ B_w^T, which the MXU executes in microseconds; the
    math is identical (the band matrix rows ARE the truncated kernels).
    """
    h, w = img.shape
    bh = blur_band_matrix(h, sigma, truncate)
    bw = blur_band_matrix(w, sigma, truncate)
    x = img.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST  # full-f32 passes; bf16 default would
    out = jnp.einsum("ik,kw->iw", bh, x, precision=hi)  # fail scipy parity
    out = jnp.einsum("hw,jw->hj", out, bw, precision=hi)
    return out


def displacement_fields(
    key: jax.Array,
    shape: Tuple[int, int],
    alpha: float,
    sigma: float,
    truncate: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random smooth displacement (dy, dx), each = gaussian_blur(U[-1,1]) * alpha
    (reference: utils/augmentations.py:27-28)."""
    kx, ky = jax.random.split(key)
    rx = jax.random.uniform(kx, shape, jnp.float32, -1.0, 1.0)
    ry = jax.random.uniform(ky, shape, jnp.float32, -1.0, 1.0)
    dx = gaussian_blur_2d(rx, sigma, truncate) * alpha
    dy = gaussian_blur_2d(ry, sigma, truncate) * alpha
    return dy, dx


def sample_2d(
    img: jnp.ndarray,
    yy: jnp.ndarray,
    xx: jnp.ndarray,
    order: int,
    mode: str = "reflect",
) -> jnp.ndarray:
    """map_coordinates on a 2D array at (yy, xx); order 0 (nearest, preserves
    labels) or 1 (bilinear), scipy-compatible 'reflect' boundary."""
    return jax.scipy.ndimage.map_coordinates(
        img.astype(jnp.float32) if order == 1 else img,
        [yy, xx],
        order=order,
        mode=mode,
    )


@partial(jax.jit, static_argnames=("alpha", "sigma", "truncate"))
def elastic_deform(
    key: jax.Array,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    alpha: float = 2000.0,
    sigma: float = 20.0,
    truncate: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deform (image, mask) with one shared displacement field.

    image (H, W) float or uint; mask (H, W) integer labels. Image is sampled
    bilinearly, mask nearest — exactly the reference's order-1/order-0 split
    (reference: utils/augmentations.py:35-37).
    """
    h, w = image.shape
    dy, dx = displacement_fields(key, (h, w), alpha, sigma, truncate)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + dy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + dx
    img_d = sample_2d(image, yy, xx, order=1)
    mask_d = sample_2d(mask, yy, xx, order=0).astype(mask.dtype)
    return img_d, mask_d


def reflect_index(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """scipy 'reflect' boundary ((d c b a | a b c d | d c b a), period 2n)
    for integer indices of any magnitude."""
    idx = jnp.mod(idx, 2 * n)
    return jnp.where(idx >= n, 2 * n - 1 - idx, idx)


def displacement_pad(alpha: float, sigma: float) -> int:
    """Static bound on |displacement| used to size the reflect-padded
    sampling halo. The blurred uniform field is a kernel-weighted sum of
    U[-1,1] with std 1/(2*sigma*sqrt(pi)) in 2D, so 8 standard deviations of
    the displacement (alpha * field) is never exceeded in practice
    (P < 1e-15 per pixel); coordinates are clamped to the halo so the
    (astronomically rare) tail clips instead of reading out of bounds."""
    sd = float(alpha) / (2.0 * float(sigma) * math.sqrt(math.pi))
    return int(math.ceil(min(8.0 * sd, float(alpha)))) + 1


def _use_pallas_sampler(h: int, w: int, d: int) -> bool:
    """The Pallas resampler needs TPU + block-divisible shapes; anything
    else (CPU tests, odd sizes) takes the XLA gather path."""
    import os

    if os.environ.get("UNETSEG_NO_PALLAS_ELASTIC"):
        return False
    from unetseg_tpu.ops.pallas.elastic import BH, BW

    return jax.default_backend() == "tpu" and h % BH == 0 and w % BW == 0


@partial(jax.jit, static_argnames=("alpha", "sigma", "truncate"))
def elastic_deform_batch(
    key: jax.Array,
    images: jnp.ndarray,
    masks: jnp.ndarray,
    alpha: float = 2000.0,
    sigma: float = 20.0,
    truncate: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-item deformation for a batch (N, H, W); one fresh subkey per item,
    mirroring the reference's fresh seed per __getitem__
    (reference: utils/dataset.py:83-93).

    TPU schedule: runtime-index gathers are the slow path. On TPU with
    block-divisible shapes the sampling runs as the Pallas matmul-resampler
    (ops/pallas/elastic.py — windowed DMA + one-hot-matmul interpolation);
    elsewhere it falls back to one lax.gather of (2, 2, 2) patches from a
    reflect-materialized (Hp, Wp, 2) pack, which serves all 4 bilinear
    image taps and the nearest mask tap at once (itself ~1.9x faster than
    vmapped map_coordinates). Both paths clamp coordinates into the
    displacement_pad halo and match the per-item path to float tolerance
    (bilinear) / round-ties (nearest)."""
    b, h, w = images.shape
    d = displacement_pad(alpha, sigma)
    keys = jax.random.split(key, b)
    dys, dxs = jax.vmap(
        lambda k: displacement_fields(k, (h, w), alpha, sigma, truncate)
    )(keys)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None] + dys
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :] + dxs
    # clamp into the halo; floor stays a valid (2,2) patch start
    yy = jnp.clip(yy, -d, h - 1 + d - 1.001)
    xx = jnp.clip(xx, -d, w - 1 + d - 1.001)

    if _use_pallas_sampler(h, w, d):
        from unetseg_tpu.ops.pallas.elastic import PAD_X, PAD_Y, sample_displaced

        # reflect-padded pack with an extra DMA-tile of padding per axis
        # (window origins are tile-quantized inside the kernel)
        py, px = d + PAD_Y, d + PAD_X
        p = jnp.stack(
            [images.astype(jnp.float32), masks.astype(jnp.float32)], axis=1
        )  # (B, 2, H, W)
        if py < h and px < w:
            # single-reflection halo: scipy 'reflect' ((d c b a | a b c d))
            # as flipped-slice concats — bandwidth copies instead of the
            # full-image gather XLA lowers indexed takes to (measured
            # 16.3 ms/step of the augmented train step; copies are ~0.5 ms)
            p = jnp.concatenate(
                [p[:, :, :py][:, :, ::-1], p, p[:, :, h - py:][:, :, ::-1]],
                axis=2,
            )
            pack_yx = jnp.concatenate(
                [p[..., :px][..., ::-1], p, p[..., w - px:][..., ::-1]],
                axis=3,
            )  # (B, 2, Hp, Wp)
        else:
            rows_p = reflect_index(jnp.arange(-py, h + py), h)
            cols_p = reflect_index(jnp.arange(-px, w + px), w)
            pack_yx = p[:, :, rows_p[:, None], cols_p[None, :]]
        img_d, mask_d = sample_displaced(pack_yx, yy, xx, d)
        return img_d, mask_d.astype(masks.dtype)

    # reflect-padded pack, built by indexed takes (valid for any halo
    # size, unlike jnp.pad mode='reflect' which requires pad < dim)
    rows = reflect_index(jnp.arange(-d, h + d), h)
    cols = reflect_index(jnp.arange(-d, w + d), w)
    pack = jnp.stack(
        [images.astype(jnp.float32), masks.astype(jnp.float32)], axis=-1
    )[:, rows[:, None], cols[None, :], :]  # (B, Hp, Wp, 2)

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    ty = yy - y0
    tx = xx - x0
    starts = jnp.stack(
        [
            (y0.astype(jnp.int32) + d).reshape(b, -1),
            (x0.astype(jnp.int32) + d).reshape(b, -1),
        ],
        axis=-1,
    )  # (B, H*W, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patches = jax.vmap(
        lambda p, s: jax.lax.gather(
            p, s, dnums, slice_sizes=(2, 2, 2),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
    )(pack, starts).reshape(b, h, w, 2, 2, 2)

    img_d = (
        patches[..., 0, 0, 0] * (1 - ty) * (1 - tx)
        + patches[..., 0, 1, 0] * (1 - ty) * tx
        + patches[..., 1, 0, 0] * ty * (1 - tx)
        + patches[..., 1, 1, 0] * ty * tx
    )
    ry1 = jnp.round(yy) > y0  # nearest tap is the +1 row/col of the patch
    rx1 = jnp.round(xx) > x0
    m = patches[..., 1]
    near = jnp.where(
        ry1,
        jnp.where(rx1, m[..., 1, 1], m[..., 1, 0]),
        jnp.where(rx1, m[..., 0, 1], m[..., 0, 0]),
    )
    return img_d, near.astype(masks.dtype)
