"""U-Net model tests: geometry, channels, numerics parity of the building
blocks against torch (CPU) with identical weights.

Full-size geometry and parameter counts are checked with `jax.eval_shape`
(pure tracing, no XLA compile) so they stay fast on the single-core CPU CI;
numerics tests run tiny nets for real.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.models.unet import (
    UNet,
    center_crop_nhwc,
    init_unet,
    upsample_bilinear_align_corners,
)

F32 = ModelConfig(compute_dtype="float32")
TINY = ModelConfig(compute_dtype="float32", base_features=4)


def shapes_of(tree):
    return jax.tree.map(lambda x: x.shape, tree)


def traced_init(model, input_size, batch=1):
    x = jax.ShapeDtypeStruct((batch, input_size, input_size, model.cfg.in_channels), jnp.float32)
    return jax.eval_shape(lambda xx: model.init(jax.random.key(0), xx, train=False), x)


def traced_apply(model, variables, input_size, batch=1, train=False):
    x = jax.ShapeDtypeStruct((batch, input_size, input_size, model.cfg.in_channels), jnp.float32)
    if train:
        return jax.eval_shape(
            lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"]),
            variables, x,
        )
    return jax.eval_shape(lambda v, xx: model.apply(v, xx, train=False), variables, x)


def test_output_geometry_512():
    """The reference's own self-check: 512 -> 324 with 2 channels
    (reference: models/unet_model.py:192-222)."""
    model = UNet(cfg=F32)
    variables = traced_init(model, 512)
    y = traced_apply(model, variables, 512)
    assert y.shape == (1, 324, 324, 2)
    assert y.dtype == jnp.float32


def test_output_geometry_572_paper():
    model = UNet(cfg=F32)
    variables = traced_init(model, 572)
    y = traced_apply(model, variables, 572)
    assert y.shape == (1, 388, 388, 2)


def test_output_geometry_bf16_policy():
    """bf16 compute still yields fp32 logits (loss wants full precision)."""
    model = UNet(cfg=ModelConfig(compute_dtype="bfloat16"))
    variables = traced_init(model, 188)
    y = traced_apply(model, variables, 188)
    assert y.shape == (1, 4, 4, 2)
    assert y.dtype == jnp.float32


def test_param_count_31M():
    """The 5-level 64..1024 valid-conv U-Net has ~31M params, all fp32."""
    model = UNet(cfg=F32)
    variables = traced_init(model, 188)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 30_000_000 < n < 32_000_000
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"]))


def test_bilinear_variant_geometry():
    model = UNet(cfg=ModelConfig(compute_dtype="float32", bilinear=True))
    variables = traced_init(model, 188)
    y = traced_apply(model, variables, 188)
    assert y.shape == (1, 4, 4, 2)


def test_tiny_forward_executes():
    """Real execution on a narrow net: finite logits, batch_stats updated."""
    model = UNet(cfg=TINY)
    variables = init_unet(model, jax.random.key(0), input_size=188)
    x = jax.random.normal(jax.random.key(1), (2, 188, 188, 1))
    y, updated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 4, 4, 2)
    assert np.isfinite(np.asarray(y)).all()
    old = variables["batch_stats"]["enc0"]["bn0"]["mean"]
    new = updated["batch_stats"]["enc0"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_center_crop_matches_reference_semantics():
    x = jnp.arange(7 * 9, dtype=jnp.float32).reshape(1, 7, 9, 1)
    c = center_crop_nhwc(x, 4, 4)
    # start = (7-4)//2 = 1, (9-4)//2 = 2
    np.testing.assert_array_equal(
        np.asarray(c)[0, :, :, 0], np.asarray(x)[0, 1:5, 2:6, 0]
    )


def test_bilinear_upsample_align_corners_vs_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    x = rs.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="bilinear", align_corners=True
    )
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_double_conv_matches_torch_with_same_weights():
    """Cross-check the conv+BN+ReLU numerics against torch with identical
    weights — validates layout conventions (HWIO vs OIHW) and BN eval math."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(1)

    x = rs.randn(1, 16, 16, 3).astype(np.float32)
    w = rs.randn(3, 3, 3, 8).astype(np.float32) * 0.1  # HWIO
    b = rs.randn(8).astype(np.float32) * 0.1
    mean = rs.randn(8).astype(np.float32) * 0.1
    var = np.abs(rs.randn(8).astype(np.float32)) + 0.5
    scale = rs.randn(8).astype(np.float32) * 0.1 + 1.0
    bias = rs.randn(8).astype(np.float32) * 0.1

    from flax import linen as nn

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="VALID", name="conv")(x)
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name="bn"
            )(x)
            return nn.relu(x)

    variables = {
        "params": {
            "conv": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
            "bn": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        },
        "batch_stats": {"bn": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
    }
    ours = np.asarray(Stage().apply(variables, jnp.asarray(x)))

    conv = torch.nn.Conv2d(3, 8, 3, padding=0)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))  # OIHW
        conv.bias.copy_(torch.from_numpy(b))
    bn = torch.nn.BatchNorm2d(8, eps=1e-5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.eval()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = torch.relu(bn(conv(xt))).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_transposed_conv_doubles_size_vs_torch():
    """ConvTranspose k=2 s=2 VALID must double spatial size and match torch's
    ConvTranspose2d numerics with shared weights
    (reference: models/unet_model.py:45)."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rs = np.random.RandomState(2)
    x = rs.randn(1, 6, 6, 4).astype(np.float32)
    w = rs.randn(2, 2, 4, 2).astype(np.float32) * 0.3  # HWIO for flax
    b = rs.randn(2).astype(np.float32) * 0.1

    mod = nn.ConvTranspose(2, kernel_size=(2, 2), strides=(2, 2), padding="VALID")
    variables = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    assert ours.shape == (1, 12, 12, 2)

    tconv = torch.nn.ConvTranspose2d(4, 2, kernel_size=2, stride=2)
    with torch.no_grad():
        # torch weight layout: (in, out, kH, kW); flax HWIO = (kH,kW,in,out),
        # and flax's conv_transpose applies the kernel spatially flipped
        # relative to torch's deconvolution.
        w_flipped = w[::-1, ::-1].copy()
        tconv.weight.copy_(torch.from_numpy(w_flipped.transpose(2, 3, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(b))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = tconv(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
