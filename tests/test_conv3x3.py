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


def test_enc0_fused_matches_chained():
    """Fused stem+conv1+pool kernel == the chained phase2 kernels (and the
    lax reference): same ingest, identical valid region of skip and pooled."""
    from unetseg_tpu.ops.pallas.conv3x3 import (
        conv3x3_phase2,
        enc0_fused_phase2,
        from_lanes,
        from_lanes_p2,
        lane_stride,
        to_lanes_p2,
    )

    rs = np.random.RandomState(8)
    s = 30  # valid U-Net-ish ingest: conv->conv->pool needs (s-4) even
    x = jnp.asarray(rs.rand(2, s, s, 4).astype(np.float32))
    k0 = jnp.asarray(rs.rand(3, 3, 4, 16).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rs.rand(16, 1).astype(np.float32) - 0.5)
    k1 = jnp.asarray(rs.rand(3, 3, 16, 16).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rs.rand(16, 1).astype(np.float32) - 0.5)
    one = jnp.ones((16, 1), np.float32)
    stride = lane_stride(-(-s // 2))
    xl = to_lanes_p2(x)

    h = conv3x3_phase2(xl, k0, one, b0, stride, interpret=True,
                       h_valid=s, raw_rows=True, unit_scale=True)
    skip_c, pool_c = conv3x3_phase2(h, k1, one, b1, stride, interpret=True,
                                    fuse_pool=True, h_valid=s - 2,
                                    raw_rows=True, unit_scale=True)
    skip_f, pool_f = enc0_fused_phase2(xl, k0, b0, k1, b1, stride,
                                       h_valid=s, interpret=True)

    ho, wo = s - 4, s - 4
    got_skip = from_lanes_p2(skip_f[:ho], 2, wo)
    want_skip = from_lanes_p2(skip_c[:ho], 2, wo)
    np.testing.assert_allclose(np.asarray(got_skip), np.asarray(want_skip),
                               atol=2e-5)
    got_pool = from_lanes(pool_f[: ho // 2], 2, wo // 2)
    want_pool = from_lanes(pool_c[: ho // 2], 2, wo // 2)
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               atol=2e-5)

    # and against the plain lax reference
    h_ref = _ref_conv(x, k0, b0[:, 0])
    c_ref = _ref_conv(h_ref, k1, b1[:, 0])
    np.testing.assert_allclose(np.asarray(got_skip), np.asarray(c_ref),
                               atol=2e-5)
    p_ref = jax.lax.reduce_window(
        c_ref, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(p_ref),
                               atol=2e-5)


def test_conv_head_fused_matches_unfused():
    """conv3x3_head_phase2 == conv3x3_phase2 + per-phase 1x1 head dot."""
    from unetseg_tpu.ops.pallas.conv3x3 import (
        conv3x3_head_phase2,
        conv3x3_phase2,
        from_lanes_p2,
        lane_stride,
        to_lanes_p2,
    )

    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.rand(2, 21, 130, 16).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 16, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.rand(16, 1).astype(np.float32) - 0.5)
    ko = jnp.asarray(rs.rand(16, 2).astype(np.float32) - 0.5)
    bo = jnp.asarray(rs.rand(2).astype(np.float32))
    one = jnp.ones((16, 1), np.float32)
    stride = lane_stride(65)
    xl = to_lanes_p2(x)

    ll = conv3x3_head_phase2(xl, w, b, ko, bo, stride, interpret=True)
    got = from_lanes_p2(ll, 2, 128)

    y = conv3x3_phase2(xl, w, one, b, stride, interpret=True,
                       unit_scale=True)
    y_nhwc = from_lanes_p2(y, 2, 128)
    want = jnp.einsum("bhwc,cn->bhwn", y_nhwc, ko) + bo
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dec_tail_fused_matches_chain():
    """dec_tail_phase2 == dec_conv0_phase2 -> conv3x3_phase2 -> 1x1 head."""
    from unetseg_tpu.ops.pallas.conv3x3 import (
        conv3x3_phase2,
        dec_conv0_phase2,
        dec_tail_phase2,
        from_lanes_p2,
        lane_stride,
        to_lanes_p2,
    )

    rs = np.random.RandomState(10)
    # skip 2x larger than up with an even crop offset (U-Net dec geometry)
    hs, hu = 36, 28
    x_s = jnp.asarray(rs.rand(2, hs, hs, 8).astype(np.float32))
    x_u = jnp.asarray(rs.rand(2, hu, hu, 8).astype(np.float32))
    w0 = jnp.asarray(rs.rand(3, 3, 16, 16).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rs.rand(16, 1).astype(np.float32) - 0.5)
    w1 = jnp.asarray(rs.rand(3, 3, 16, 16).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rs.rand(16, 1).astype(np.float32) - 0.5)
    ko = jnp.asarray(rs.rand(16, 2).astype(np.float32) - 0.5)
    bo = jnp.asarray(rs.rand(2).astype(np.float32))
    one = jnp.ones((16, 1), np.float32)
    stride = lane_stride(-(-hs // 2))
    sl = to_lanes_p2(x_s)
    ul = jnp.pad(to_lanes_p2(x_u), ((0, 0), (0, 0), (0, 0)))
    # match lane strides: re-lay the up tensor at the skip's stride
    ul = to_lanes_p2(jnp.pad(x_u, ((0, 0), (0, 0), (0, 2 * stride - hu), (0, 0)))[:, :, : 2 * stride])
    row_off = (hs - hu) // 2

    got_l = dec_tail_phase2(sl, ul, w0, b0, w1, b1, ko, bo, stride,
                            out_rows=hu - 4, row_off=row_off,
                            lane_off=row_off // 2, interpret=True)
    got = from_lanes_p2(got_l, 2, hu - 4)

    y = dec_conv0_phase2(sl, ul, w0, one, b0, stride, out_rows=hu - 2,
                         row_off=row_off, lane_off=row_off // 2,
                         interpret=True, raw_rows=True, unit_scale=True)
    y = conv3x3_phase2(y, w1, one, b1, stride, interpret=True,
                       h_valid=hu - 2, unit_scale=True)
    y_nhwc = from_lanes_p2(y, 2, hu - 4)
    want = jnp.einsum("bhwc,cn->bhwn", y_nhwc, ko) + bo
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
