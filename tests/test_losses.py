"""Loss numerics vs torch CrossEntropyLoss with identical inputs."""

import numpy as np
import pytest
import jax.numpy as jnp

from unetseg_tpu.ops.losses import (
    binary_probs_from_logits,
    center_crop_nhw,
    cross_entropy,
    cropped_weighted_ce,
    per_pixel_ce,
    weighted_cross_entropy,
)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_per_pixel_ce_vs_torch():
    torch = pytest.importorskip("torch")
    logits = _rand((2, 5, 6, 3), 0)
    targets = np.random.RandomState(1).randint(0, 3, (2, 5, 6))
    ours = np.asarray(per_pixel_ce(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch.nn.CrossEntropyLoss(reduction="none")(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(targets).long(),
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_weighted_ce_vs_torch_pipeline():
    """Full reference loss: per-pixel CE * weight map, then mean
    (reference: utils/losses.py:49-57)."""
    torch = pytest.importorskip("torch")
    logits = _rand((2, 4, 4, 2), 2)
    targets = np.random.RandomState(3).randint(0, 2, (2, 4, 4))
    weights = np.abs(_rand((2, 4, 4), 4)) + 0.1
    ours = float(
        weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights))
    )
    pl = torch.nn.CrossEntropyLoss(reduction="none")(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(targets).long(),
    )
    ref = float((pl * torch.from_numpy(weights)).mean())
    assert abs(ours - ref) < 1e-6


def test_unweighted_ce_is_weight_one():
    logits = _rand((1, 3, 3, 2), 5)
    targets = np.random.RandomState(6).randint(0, 2, (1, 3, 3))
    a = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    b = float(
        weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), jnp.ones((1, 3, 3), np.float32)
        )
    )
    assert abs(a - b) < 1e-7


def test_cropped_weighted_ce_geometry():
    """Targets at 512 are center-cropped to 324 logits like
    scripts/train.py:118-126."""
    logits = jnp.zeros((1, 324, 324, 2))
    targets = jnp.zeros((1, 512, 512), jnp.int32)
    weights = jnp.ones((1, 512, 512))
    loss, t, w = cropped_weighted_ce(logits, targets, weights)
    assert t.shape == (1, 324, 324)
    assert w.shape == (1, 324, 324)
    assert np.isfinite(float(loss))


def test_center_crop_nhw_bounds():
    x = jnp.arange(100, dtype=jnp.float32).reshape(1, 10, 10)
    c = center_crop_nhw(x, 4, 4)
    np.testing.assert_array_equal(np.asarray(c)[0], np.asarray(x)[0, 3:7, 3:7])


def test_binary_probs_two_channel_softmax():
    logits = _rand((1, 2, 2, 2), 7)
    p = np.asarray(binary_probs_from_logits(jnp.asarray(logits)))
    e = np.exp(logits)
    ref = (e[..., 1] / e.sum(-1))
    np.testing.assert_allclose(p, ref, atol=1e-6)
    assert p.shape == (1, 2, 2)


def test_binary_probs_one_channel_sigmoid():
    logits = _rand((1, 2, 2, 1), 8)
    p = np.asarray(binary_probs_from_logits(jnp.asarray(logits)))
    np.testing.assert_allclose(p, 1 / (1 + np.exp(-logits[..., 0])), atol=1e-6)
