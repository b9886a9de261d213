"""Pallas kernels in interpret mode (CPU): value + gradient parity with the
XLA reference implementations. Native execution is exercised on TPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.ops.losses import weighted_cross_entropy
from unetseg_tpu.ops.pallas.minplus import edt_sq_pallas, minplus
from unetseg_tpu.ops.pallas.wce import (
    weighted_ce_pixels,
    weighted_cross_entropy_pallas,
)


def _data(n=2, h=9, w=11, c=2, seed=0):
    rs = np.random.RandomState(seed)
    logits = rs.randn(n, h, w, c).astype(np.float32)
    targets = rs.randint(0, c, (n, h, w))
    weights = (rs.rand(n, h, w).astype(np.float32) + 0.25)
    return jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)


def test_wce_forward_matches_xla():
    logits, targets, weights = _data()
    ours = weighted_cross_entropy_pallas(logits, targets, weights, interpret=True)
    ref = weighted_cross_entropy(logits, targets, weights)
    assert abs(float(ours) - float(ref)) < 1e-5


def test_wce_per_pixel_values():
    logits, targets, weights = _data(seed=1)
    per = weighted_ce_pixels(logits, targets, weights, True)
    lg = np.asarray(logits)
    lse = np.log(np.exp(lg).sum(-1))
    picked = np.take_along_axis(lg, np.asarray(targets)[..., None], -1)[..., 0]
    ref = (lse - picked) * np.asarray(weights)
    np.testing.assert_allclose(np.asarray(per), ref, atol=1e-5)


def test_wce_gradient_matches_xla():
    logits, targets, weights = _data(seed=2)

    g_ours = jax.grad(
        lambda l: weighted_cross_entropy_pallas(l, targets, weights, True)
    )(logits)
    g_ref = jax.grad(
        lambda l: weighted_cross_entropy(l, targets, weights)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=1e-5)


def test_wce_bf16_logits():
    logits, targets, weights = _data(seed=3)
    lb = logits.astype(jnp.bfloat16)
    ours = float(weighted_cross_entropy_pallas(lb, targets, weights, True))
    ref = float(weighted_cross_entropy(lb, targets, weights))
    assert abs(ours - ref) < 1e-2
    g = jax.grad(lambda l: weighted_cross_entropy_pallas(l, targets, weights, True))(lb)
    assert g.dtype == jnp.bfloat16


def test_minplus_matches_dense():
    rs = np.random.RandomState(0)
    a = rs.rand(37, 53).astype(np.float32) * 10
    b = rs.rand(53, 29).astype(np.float32) * 10
    ours = np.asarray(minplus(jnp.asarray(a), jnp.asarray(b), interpret=True))
    ref = (a[:, :, None] + b[None, :, :]).min(axis=1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_minplus_padding_neutral():
    """Padding with +inf must not leak into results at ragged sizes."""
    rs = np.random.RandomState(1)
    a = rs.rand(130, 127).astype(np.float32)
    b = rs.rand(127, 129).astype(np.float32)
    ours = np.asarray(minplus(jnp.asarray(a), jnp.asarray(b), interpret=True))
    ref = (a[:, :, None] + b[None, :, :]).min(axis=1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_edt_sq_pallas_matches_scipy():
    from scipy.ndimage import distance_transform_edt as sp_edt

    rs = np.random.RandomState(2)
    feat = rs.rand(40, 44) > 0.93
    if not feat.any():
        feat[3, 5] = True
    ours = np.asarray(edt_sq_pallas(jnp.asarray(feat), interpret=True))
    ref = sp_edt(~feat) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-3)


# ------------------------------------------------- elastic matmul-resampler
def test_elastic_sampler_matches_gather_path():
    """Pallas sample_displaced (interpret) == the XLA (2,2,2)-patch gather
    path of elastic_deform_batch, taps and weights identical."""
    from unetseg_tpu.ops.elastic import (
        displacement_fields,
        displacement_pad,
        elastic_deform_batch,
        reflect_index,
    )
    from unetseg_tpu.ops.pallas.elastic import PAD_X, PAD_Y, sample_displaced

    b, h, w = 2, 64, 128
    alpha, sigma = 30.0, 4.0
    d = displacement_pad(alpha, sigma)
    rs = np.random.RandomState(3)
    images = jnp.asarray(rs.rand(b, h, w), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 7, (b, h, w)), jnp.int32)
    key = jax.random.key(11)

    # reference: the XLA gather path (CPU backend never dispatches to Pallas)
    ref_img, ref_mask = elastic_deform_batch(
        key, images, masks, alpha=alpha, sigma=sigma
    )

    # rebuild the same coordinates + x-major pack, run the kernel interpreted
    keys = jax.random.split(key, b)
    dys, dxs = jax.vmap(
        lambda k: displacement_fields(k, (h, w), alpha, sigma, 4.0)
    )(keys)
    yy = jnp.clip(
        jnp.arange(h, dtype=jnp.float32)[None, :, None] + dys, -d, h - 1 + d - 1.001
    )
    xx = jnp.clip(
        jnp.arange(w, dtype=jnp.float32)[None, None, :] + dxs, -d, w - 1 + d - 1.001
    )
    rows = reflect_index(jnp.arange(-(d + PAD_Y), h + d + PAD_Y), h)
    cols = reflect_index(jnp.arange(-(d + PAD_X), w + d + PAD_X), w)
    pack_x = jnp.stack(
        [images.astype(jnp.float32), masks.astype(jnp.float32)], axis=1
    )[:, :, rows[:, None], cols[None, :]]

    img, mask = sample_displaced(pack_x, yy, xx, d, interpret=True)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref_img), atol=2e-5, rtol=0
    )
    # nearest taps are exact 0/1 selections -> integer-equal
    np.testing.assert_array_equal(
        np.asarray(mask).astype(np.int32), np.asarray(ref_mask)
    )
