"""conv_cblock (in-VMEM im2col blocked conv): parity vs lax.conv in
interpret mode, including the internal CI/W/H padding paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.ops.pallas.conv_cblock import conv3x3_cblock


def _ref(x, k, b, relu):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return np.maximum(np.asarray(y), 0) if relu else np.asarray(y)


@pytest.mark.parametrize(
    "b,h,w,ci,co",
    [
        (2, 20, 22, 128, 128),   # aligned channels, unaligned W
        (1, 13, 17, 64, 128),    # CI pad 64->128, H not a block multiple
        (2, 12, 12, 128, 256),   # CO = 2 lane tiles
        (1, 10, 10, 8, 128),     # tiny CI pad
    ],
)
@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("mode", ["im2col", "dots9"])
def test_cblock_matches_lax(b, h, w, ci, co, relu, mode):
    rs = np.random.RandomState(0)
    x = rs.randn(b, h, w, ci).astype(np.float32)
    k = (rs.randn(3, 3, ci, co) * 0.1).astype(np.float32)
    bias = rs.randn(co).astype(np.float32)
    want = _ref(x, k, bias, relu)
    got = np.asarray(conv3x3_cblock(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
        relu=relu, interpret=True, mode=mode,
    ))
    assert got.shape == (b, h - 2, w - 2, co)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_cblock_bf16_accumulates_f32():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 12, 12, 128).astype(np.float32)
    k = (rs.randn(3, 3, 128, 128) * 0.1).astype(np.float32)
    bias = np.zeros(128, np.float32)
    want = _ref(x, k, bias, True)
    got = np.asarray(conv3x3_cblock(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(bias), interpret=True,
    ).astype(jnp.float32))
    # bf16 operand error only — the accumulation is f32
    assert np.abs(got - want).max() < 0.15


def test_tier1_forward_with_cblock_routing():
    """folded_forward_tier1(cblock={'all'}) routes every lane-aligned middle
    conv through conv3x3_cblock and must match the XLA middle exactly
    (base_features=8 puts enc4 at CO=128, the routed stage)."""
    from unetseg_tpu.core.config import ModelConfig
    from unetseg_tpu.infer.folding import fold_batchnorm
    from unetseg_tpu.infer.lanes_net import folded_forward_tier1, supports
    from unetseg_tpu.models.unet import UNet, init_unet

    cfg = ModelConfig(base_features=8, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(0), input_size=188)
    _, fv = fold_batchnorm(cfg, v)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 188, 188, 1),
                    jnp.float32)
    assert supports(cfg, 188)
    a = folded_forward_tier1(fv["params"], x, cfg, interpret=True)
    b = folded_forward_tier1(fv["params"], x, cfg, interpret=True,
                             cblock=frozenset(["all"]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
