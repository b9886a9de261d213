"""Tier-1 lanes-native folded forward (infer/lanes_net.py): end-to-end
parity with FoldedUNet on the tiny-net geometry (interpret-mode kernels)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.infer.folding import fold_batchnorm
from unetseg_tpu.infer.lanes_net import folded_forward_tier1, supports
from unetseg_tpu.models.unet import UNet, init_unet


def _folded_tiny(dtype="float32"):
    cfg = ModelConfig(base_features=4, compute_dtype=dtype)
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(0), input_size=188)
    fmodel, fvars = fold_batchnorm(cfg, v)
    return cfg, fmodel, fvars


def test_supports_standard_geometries():
    cfg = ModelConfig()
    assert supports(cfg, 512)
    assert supports(cfg, 700)
    assert supports(ModelConfig(base_features=4), 188)
    assert not supports(ModelConfig(bilinear=True), 512)


def test_tier1_matches_folded_unet():
    cfg, fmodel, fvars = _folded_tiny()
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 188, 188, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(fvars["params"], x, cfg, interpret=True)
    assert got.shape == ref.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_tier1_three_class_head():
    cfg = ModelConfig(base_features=4, num_classes=3, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(1), input_size=188)
    fmodel, fvars = fold_batchnorm(cfg, v)
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 188, 188, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(fvars["params"], x, cfg, interpret=True)
    assert got.shape == ref.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_mid_hcnw_matches_folded_unet():
    """The (H, C, B, W) middle (zero boundary transposes) is numerically
    identical to the NHWC middle."""
    cfg, fmodel, fvars = _folded_tiny()
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 188, 188, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(
        fvars["params"], x, cfg, interpret=True, mid_hcnw=True
    )
    assert got.shape == ref.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


@pytest.mark.slow
@pytest.mark.parametrize("size", [236, 260])
def test_mid_hcnw_parity_across_lane_strides(size):
    """HCNW-middle valid-width bookkeeping across both lane-stride classes
    (the garbage-tail arithmetic differs with st0 - wp0)."""
    cfg = ModelConfig(base_features=4, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(5), input_size=size)
    fmodel, fvars = fold_batchnorm(cfg, v)
    x = jnp.asarray(
        np.random.RandomState(size).rand(1, size, size, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(
        fvars["params"], x, cfg, interpret=True, mid_hcnw=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_supports_tier2_geometries():
    from unetseg_tpu.infer.lanes_net import supports_tier2

    assert supports_tier2(ModelConfig(), 512)
    assert supports_tier2(ModelConfig(), 700)
    assert supports_tier2(ModelConfig(base_features=8), 188)
    # dense kernels need CI sublane tiles: f0=4 stays tier-1 only
    assert not supports_tier2(ModelConfig(base_features=4), 188)


def test_tier2_matches_folded_unet():
    cfg = ModelConfig(base_features=8, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(2), input_size=188)
    fmodel, fvars = fold_batchnorm(cfg, v)
    x = jnp.asarray(
        np.random.RandomState(2).rand(2, 188, 188, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(
        fvars["params"], x, cfg, interpret=True, tier2=True
    )
    assert got.shape == ref.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)

@pytest.mark.slow
@pytest.mark.parametrize("size", [236, 260])
def test_tier1_parity_across_lane_strides(size):
    """supports() admits 143 input sizes in [188, 760) but parity was pinned
    only at 188/512/700. 260 is the smallest size in the stride-256 lane
    class (lane_stride jumps 128->256 when the half-size crosses 128); 236
    exercises stride-128 crop offsets different from 188's."""
    cfg = ModelConfig(base_features=4, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(3), input_size=size)
    fmodel, fvars = fold_batchnorm(cfg, v)
    assert supports(cfg, size)
    x = jnp.asarray(
        np.random.RandomState(size).rand(1, size, size, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(fvars["params"], x, cfg, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


@pytest.mark.slow
def test_tier2_parity_stride256():
    """Tier-2 dense kernels at the smallest stride-256 geometry."""
    from unetseg_tpu.infer.lanes_net import supports_tier2

    size = 260
    cfg = ModelConfig(base_features=8, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(4), input_size=size)
    fmodel, fvars = fold_batchnorm(cfg, v)
    assert supports_tier2(cfg, size)
    x = jnp.asarray(
        np.random.RandomState(42).rand(1, size, size, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    got = folded_forward_tier1(
        fvars["params"], x, cfg, interpret=True, tier2=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_tier1_fused_enc0_and_dec_tail_match_folded_unet():
    """The fused enc0 (stem+conv1+pool one kernel) and dec-tail fusion
    granularities all reproduce FoldedUNet."""
    cfg, fmodel, fvars = _folded_tiny()
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 188, 188, 1).astype(np.float32)
    )
    ref = fmodel.apply(fvars, x)
    for dec_fuse in ("tail", "head"):
        got = folded_forward_tier1(
            fvars["params"], x, cfg, interpret=True,
            fused_enc0=True, dec_fuse=dec_fuse,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4)
