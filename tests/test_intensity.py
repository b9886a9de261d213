"""Photometric augmentation (ops/intensity.py) — extension over the
reference's elastic-only augmentation (reference: utils/augmentations.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.ops.intensity import (
    gaussian_noise_batch,
    photometric_augment_batch,
    standardize_batch,
)

KEY = jax.random.key(7)
IMGS = jnp.asarray(np.random.RandomState(0).rand(3, 32, 48).astype(np.float32))


def test_disabled_is_identity():
    out = photometric_augment_batch(KEY, IMGS, gamma_log=0.0, illum=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(IMGS))


def test_gamma_matches_numpy():
    out = photometric_augment_batch(KEY, IMGS, gamma_log=0.4, illum=0.0)
    kg, _ = jax.random.split(KEY)
    g = np.exp(np.asarray(
        jax.random.uniform(kg, (3, 1, 1), minval=-0.4, maxval=0.4)
    ))
    np.testing.assert_allclose(
        np.asarray(out), np.clip(np.asarray(IMGS), 0, 1) ** g, rtol=2e-5
    )


def test_gamma_is_per_item():
    out = np.asarray(
        photometric_augment_batch(KEY, IMGS, gamma_log=0.4, illum=0.0)
    )
    base = np.asarray(IMGS)
    # infer each item's exponent from one pixel and check it differs
    exps = [
        np.log(out[i, 0, 0]) / np.log(base[i, 0, 0]) for i in range(3)
    ]
    assert np.std(exps) > 1e-3


def test_illumination_field_is_smooth_and_bounded():
    ones = jnp.ones((2, 64, 64), jnp.float32)
    out = np.asarray(
        photometric_augment_batch(KEY, ones, gamma_log=0.0, illum=0.2)
    )
    assert np.all(out >= 0.8 - 1e-6) and np.all(out <= 1.2 + 1e-6)
    # low-frequency: neighboring pixels change slowly
    assert np.max(np.abs(np.diff(out, axis=2))) < 0.05
    # but the field is not constant
    assert out.std() > 1e-3


def test_noise_std_bounded():
    zeros = jnp.zeros((4, 64, 64), jnp.float32)
    out = np.asarray(gaussian_noise_batch(KEY, zeros, max_std=0.1))
    per_item = out.std(axis=(1, 2))
    assert np.all(per_item <= 0.12)  # sigma_i <= 0.1 (+sampling slack)
    assert per_item.max() > 0.005    # and some item actually got noise


def test_standardize_batch_matches_engine():
    out = np.asarray(standardize_batch(IMGS))
    for i in range(3):
        ref = (np.asarray(IMGS[i]) - np.asarray(IMGS[i]).mean()) / max(
            float(np.asarray(IMGS[i]).std()), 1e-6
        )
        np.testing.assert_allclose(out[i], ref, atol=1e-5)
    assert abs(out.mean()) < 1e-5


def test_train_step_with_photometric_augs_runs():
    """End-to-end: a tiny train step with all augmentation stages on."""
    from unetseg_tpu.core.config import ModelConfig, TrainConfig
    from unetseg_tpu.models.unet import UNet
    from unetseg_tpu.train.state import create_train_state
    from unetseg_tpu.train.steps import make_train_step

    size = 188
    mcfg = ModelConfig(base_features=4, compute_dtype="float32")
    tcfg = TrainConfig(batch_size=2)
    state = create_train_state(
        jax.random.key(0), model_cfg=mcfg, train_cfg=tcfg, input_size=size
    )
    step = make_train_step(
        UNet(cfg=mcfg), augment=True, elastic_alpha=30.0, elastic_sigma=4.0,
        donate=False, standardize=True,
        aug_gamma=0.3, aug_illum=0.15, aug_noise=0.05,
    )
    imgs = jnp.asarray(np.random.RandomState(1).rand(2, size, size), jnp.float32)
    masks = jnp.asarray(
        (np.random.RandomState(2).rand(2, size, size) > 0.7).astype(np.int32)
    )
    weights = jnp.ones((2, size, size), jnp.float32)
    valid = jnp.ones((2,), bool)
    state2, metrics = step(state, imgs, masks, weights, valid, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
