"""Lanes-native training forward (models/lanes_train.py): parity with
UNet.apply(train=True) — logits, updated batch statistics, and parameter
gradients (interpret-mode kernels, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.models.lanes_train import train_forward_lanes
from unetseg_tpu.models.unet import UNet, init_unet

CFG = ModelConfig(base_features=4, compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    model = UNet(cfg=CFG)
    v = init_unet(model, jax.random.key(0), input_size=188)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 188, 188, 1).astype(np.float32))
    mask = jnp.asarray([True, True])
    return model, v, x, mask


def _ref(model, v, x, mask):
    return model.apply(
        v, x, train=True, item_mask=mask, mutable=["batch_stats"]
    )


def test_forward_and_stats_parity(setup):
    model, v, x, mask = setup
    ref_logits, mutated = _ref(model, v, x, mask)
    got_logits, got_stats = train_forward_lanes(
        v["params"], v["batch_stats"], x, CFG, item_mask=mask, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-4
    )
    ref_stats = mutated["batch_stats"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_stats)
    got_flat = dict(
        (jax.tree_util.keystr(k), val)
        for k, val in jax.tree_util.tree_leaves_with_path(got_stats)
    )
    assert len(flat_ref) == len(got_flat)
    for k, val in flat_ref:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(got_flat[ks]), np.asarray(val), atol=1e-4, rtol=1e-4,
            err_msg=ks,
        )


def test_forward_parity_with_masked_item(setup):
    model, v, x, _ = setup
    mask = jnp.asarray([True, False])
    ref_logits, _ = _ref(model, v, x, mask)
    got_logits, _ = train_forward_lanes(
        v["params"], v["batch_stats"], x, CFG, item_mask=mask, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-4
    )


def test_param_gradient_parity(setup):
    model, v, x, mask = setup
    rs = np.random.RandomState(1)
    ct = jnp.asarray(rs.rand(2, 4, 4, CFG.num_classes).astype(np.float32))

    def loss_ref(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, item_mask=mask, mutable=["batch_stats"],
        )
        return jnp.sum(logits * ct)

    def loss_lanes(params):
        logits, _ = train_forward_lanes(
            params, v["batch_stats"], x, CFG, item_mask=mask, interpret=True
        )
        return jnp.sum(logits * ct)

    g_ref = jax.grad(loss_ref)(v["params"])
    g_lanes = jax.grad(loss_lanes)(v["params"])
    ref_flat = jax.tree_util.tree_leaves_with_path(g_ref)
    got = dict(
        (jax.tree_util.keystr(k), val)
        for k, val in jax.tree_util.tree_leaves_with_path(g_lanes)
    )
    assert len(ref_flat) == len(got)
    for k, val in ref_flat:
        ks = jax.tree_util.keystr(k)
        scale = max(1.0, float(jnp.max(jnp.abs(val))))
        # conv biases feeding straight into BN have an exactly-zero true
        # gradient (mean subtraction cancels the shift): both sides are
        # numerical noise there, hence the 3e-4 floor
        np.testing.assert_allclose(
            np.asarray(got[ks]) / scale, np.asarray(val) / scale,
            atol=3e-4, err_msg=ks,
        )


# ------------------------------------------------------------- tier 2
CFG8 = ModelConfig(base_features=8, compute_dtype="float32")


@pytest.fixture(scope="module")
def setup8():
    model = UNet(cfg=CFG8)
    v = init_unet(model, jax.random.key(3), input_size=188)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 188, 188, 1).astype(np.float32))
    mask = jnp.asarray([True, True])
    return model, v, x, mask


def test_tier2_forward_and_stats_parity(setup8):
    model, v, x, mask = setup8
    ref_logits, mutated = _ref(model, v, x, mask)
    got_logits, got_stats = train_forward_lanes(
        v["params"], v["batch_stats"], x, CFG8, item_mask=mask,
        interpret=True, tier2=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-4
    )
    ref_stats = mutated["batch_stats"]
    got_flat = dict(
        (jax.tree_util.keystr(k), val)
        for k, val in jax.tree_util.tree_leaves_with_path(got_stats)
    )
    for k, val in jax.tree_util.tree_leaves_with_path(ref_stats):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(got_flat[ks]), np.asarray(val), atol=1e-4, rtol=1e-4,
            err_msg=ks,
        )


@pytest.mark.slow
def test_tier2_forward_parity_with_masked_item(setup8):
    model, v, x, _ = setup8
    mask = jnp.asarray([True, False])
    ref_logits, _ = _ref(model, v, x, mask)
    got_logits, _ = train_forward_lanes(
        v["params"], v["batch_stats"], x, CFG8, item_mask=mask,
        interpret=True, tier2=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_tier2_param_gradient_parity(setup8):
    model, v, x, mask = setup8
    rs = np.random.RandomState(4)
    ct = jnp.asarray(rs.rand(2, 4, 4, CFG8.num_classes).astype(np.float32))

    def loss_ref(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, item_mask=mask, mutable=["batch_stats"],
        )
        return jnp.sum(logits * ct)

    def loss_lanes(params):
        logits, _ = train_forward_lanes(
            params, v["batch_stats"], x, CFG8, item_mask=mask,
            interpret=True, tier2=True,
        )
        return jnp.sum(logits * ct)

    g_ref = jax.grad(loss_ref)(v["params"])
    g_got = jax.grad(loss_lanes)(v["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    got_flat = dict(
        (jax.tree_util.keystr(k), val)
        for k, val in jax.tree_util.tree_leaves_with_path(g_got)
    )
    for k, val in flat_ref:
        ks = jax.tree_util.keystr(k)
        scale = max(1.0, float(np.abs(np.asarray(val)).max()))
        # Elementwise gradient parity of two numerically-different
        # train-mode BN nets is limited by ReLU boundary flips: a ~1e-6
        # forward difference flips near-zero pre-activations and changes
        # local gradients discontinuously. Measured at f0=8/188: the
        # tier-1 path (enc3 in plain XLA NHWC on BOTH sides) already
        # deviates up to 6e-2 scaled from UNet.apply, tier 2 up to 2e-3.
        # 5e-3 still catches real wiring bugs (wrong taps/masks show as
        # O(0.1-1)).
        np.testing.assert_allclose(
            np.asarray(got_flat[ks]) / scale, np.asarray(val) / scale,
            atol=5e-3, err_msg=ks,
        )
