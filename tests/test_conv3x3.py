"""Pallas fused 3x3 conv (ops/pallas/conv3x3.py): interpret-mode parity with
lax.conv + the folded-model lanes path. Native speed is measured on TPU
(docs/PARITY.md): 1.76 ms vs XLA's 4.61 ms on the enc0b shape isolated;
in-context it ships off by default (boundary transposes dominate)."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from unetseg_tpu.ops.pallas.conv3x3 import (
    conv3x3_lanes,
    conv3x3_nhwc,
    double_conv_lanes,
    from_lanes,
    lane_stride,
    pack_w_all,
    pack_w_banded,
    to_lanes,
)


def _ref_conv(x, w, bias=0.0, scale=1.0, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) * scale + bias
    return jnp.maximum(y, 0) if relu else y


def test_single_conv_matches_lax():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 20, 132, 8).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 8, 16).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.rand(16).astype(np.float32) - 0.5)
    ref = _ref_conv(x, w, bias, scale)
    out = conv3x3_nhwc(x, w, scale, bias, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_stem_ci1_padding():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(1, 12, 140, 1).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 1, 8).astype(np.float32))
    ref = _ref_conv(x, w, relu=False)
    out = conv3x3_nhwc(x, w, relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_double_conv_matches_two_lax_convs():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(2, 20, 133, 3).astype(np.float32))  # odd width
    w0 = jnp.asarray(rs.rand(3, 3, 3, 16).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rs.rand(3, 3, 16, 16).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rs.rand(16).astype(np.float32))
    b1 = jnp.asarray(rs.rand(16).astype(np.float32))
    ref = _ref_conv(_ref_conv(x, w0, b0), w1, b1)
    out = double_conv_lanes(x, w0, b0, w1, b1, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_pack_w_banded_rows1_is_pack_w_all():
    rs = np.random.RandomState(4)
    w = jnp.asarray(rs.rand(3, 3, 8, 16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pack_w_banded(w, 1)), np.asarray(pack_w_all(w))
    )


@pytest.mark.parametrize("pipelined,rows", [(False, 1), (True, 1), (True, 2)])
def test_lanes_kernel_variants_match_lax(pipelined, rows):
    """v1 (serial DMA, per-row dots) and v2 (double-buffered DMA, banded
    multi-row dots) must agree with lax.conv bit-for-bit in f32."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.rand(2, 21, 132, 8).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 8, 16).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.rand(16).astype(np.float32) - 0.5)
    ref = _ref_conv(x, w, bias[None, None, None], scale[None, None, None])
    stride = lane_stride(132)
    out_l = conv3x3_lanes(
        to_lanes(x), w, scale.reshape(16, 1), bias.reshape(16, 1), stride,
        relu=True, interpret=True, rows=rows, pipelined=pipelined,
    )
    out = from_lanes(out_l, 2, 130)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_phase2_conv_matches_lax():
    """2-phase space-to-depth conv == lax.conv (f32, interpret)."""
    from unetseg_tpu.ops.pallas.conv3x3 import (
        conv3x3_phase2,
        from_lanes_p2,
        to_lanes_p2,
    )

    rs = np.random.RandomState(6)
    for w_true in (132, 131):  # even and odd true widths
        x = jnp.asarray(rs.rand(2, 21, w_true, 8).astype(np.float32))
        w = jnp.asarray(rs.rand(3, 3, 8, 16).astype(np.float32) * 0.1)
        scale = jnp.asarray(rs.rand(16, 1).astype(np.float32) + 0.5)
        bias = jnp.asarray(rs.rand(16, 1).astype(np.float32) - 0.5)
        ref = _ref_conv(x, w, bias[:, 0], scale[:, 0])
        xl = to_lanes_p2(x)
        stride = lane_stride(-(-w_true // 2))
        out_l = conv3x3_phase2(
            xl, w, scale, bias, stride, relu=True, interpret=True
        )
        got = from_lanes_p2(out_l, 2, w_true - 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_phase2_conv_fused_pool():
    """Fused epilogue pool == reduce_window 2x2 max pool of the conv out."""
    from unetseg_tpu.ops.pallas.conv3x3 import (
        conv3x3_phase2,
        from_lanes,
        to_lanes_p2,
    )

    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.rand(2, 22, 132, 8).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 8, 16).astype(np.float32) * 0.1)
    scale = jnp.ones((16, 1), np.float32)
    bias = jnp.zeros((16, 1), np.float32)
    conv_ref = _ref_conv(x, w, relu=True)  # (2, 20, 130, 16)
    pool_ref = jax.lax.reduce_window(
        conv_ref, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    xl = to_lanes_p2(x)
    stride = lane_stride(66)
    _, pooled = conv3x3_phase2(
        xl, w, scale, bias, stride, relu=True, interpret=True, fuse_pool=True
    )
    # pooled is dense 1-phase: lane j == pooled column j
    got = from_lanes(pooled, 2, 65)[:, :10, :, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(pool_ref), atol=2e-5
    )


def test_tconv_phase2_matches_flax():
    """Lanes tconv == nn.ConvTranspose k=2 s=2 VALID (the up-path op)."""
    from flax import linen as nn

    from unetseg_tpu.ops.pallas.conv3x3 import (
        from_lanes_p2,
        tconv2x2_phase2,
        to_lanes,
    )

    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.rand(2, 11, 130, 8).astype(np.float32))
    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID")
    v = mod.init(jax.random.key(0), x)
    ref = mod.apply(v, x)  # (2, 22, 260, 4)
    w = v["params"]["kernel"]  # (2, 2, 8, 4)
    b = v["params"]["bias"]
    out_l = tconv2x2_phase2(
        to_lanes(x), w, b.reshape(4, 1), 256, interpret=True
    )
    got = from_lanes_p2(out_l, 2, 260)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dec_conv0_phase2_matches_crop_concat_conv():
    """Decoder-entry kernel == conv3x3(concat(center_crop(skip), up)) with
    the crop folded into DMA offsets + rolls."""
    from unetseg_tpu.ops.pallas.conv3x3 import (
        dec_conv0_phase2,
        from_lanes_p2,
        to_lanes_p2,
    )

    rs = np.random.RandomState(9)
    skip = jnp.asarray(rs.rand(2, 30, 140, 8).astype(np.float32))
    up = jnp.asarray(rs.rand(2, 20, 132, 8).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 16, 8).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.rand(8, 1).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.rand(8, 1).astype(np.float32) - 0.5)
    crop = skip[:, 5:25, 4:136, :]  # center crop to up's geometry
    ref = _ref_conv(
        jnp.concatenate([crop, up], axis=-1), w, bias[:, 0], scale[:, 0]
    )
    out_l = dec_conv0_phase2(
        to_lanes_p2(skip), to_lanes_p2(up), w, scale, bias,
        item_stride=128, out_rows=18, row_off=5, lane_off=2,
        relu=True, interpret=True,
    )
    got = from_lanes_p2(out_l, 2, 130)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_lanes_roundtrip():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(3, 7, 200, 8).astype(np.float32))
    back = from_lanes(to_lanes(x), 3, 200)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    assert lane_stride(200) == 256


def test_folded_unet_lanes_path_runs():
    """Tiny folded net through the lanes path (interpret via CPU? — the
    lanes kernel needs Mosaic, so on CPU suites this exercises only the
    wiring with use_lanes=False; full-width TPU parity is checked in the
    slow/native validation, docs/PARITY.md)."""
    from unetseg_tpu.core.config import ModelConfig
    from unetseg_tpu.infer.folding import fold_batchnorm
    from unetseg_tpu.models.unet import UNet, init_unet

    cfg = ModelConfig(base_features=4, compute_dtype="float32")
    model = UNet(cfg=cfg)
    v = init_unet(model, jax.random.key(0), input_size=188)
    fm, fv = fold_batchnorm(cfg, v)  # auto -> False off-TPU
    assert fm.use_lanes is False
    y = fm.apply(fv, jnp.zeros((1, 188, 188, 1)))
    assert y.shape == (1, 4, 4, 2)
