"""Whole-network numerical parity with the reference architecture: build the
same U-Net in torch, transplant its weights into our Flax model, and compare
full forward passes. This is the BASELINE.json parity requirement ("mask IoU
parity, >= 0.999 pixel agreement") tested at the network level."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import InferConfig, ModelConfig
from unetseg_tpu.infer.engine import Predictor
from unetseg_tpu.infer.folding import fold_batchnorm
from unetseg_tpu.models.unet import UNet, init_unet

torch = pytest.importorskip("torch")

from tests.torch_ref import build_torch_unet, transplant_weights  # noqa: E402


def _randomize_bn_stats(model):
    """Give BN non-trivial running stats so folding/eval paths are exercised."""
    rs = np.random.RandomState(0)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(rs.randn(m.num_features).astype("f") * 0.2))
                m.running_var.copy_(torch.from_numpy((np.abs(rs.randn(m.num_features)) + 0.5).astype("f")))
                m.weight.copy_(torch.from_numpy((rs.randn(m.num_features) * 0.1 + 1).astype("f")))
                m.bias.copy_(torch.from_numpy((rs.randn(m.num_features) * 0.1).astype("f")))


@pytest.fixture(scope="module")
def paired_models():
    base = 4
    cfg = ModelConfig(compute_dtype="float32", base_features=base)
    tm = build_torch_unet(base=base)
    _randomize_bn_stats(tm)
    fm = UNet(cfg=cfg)
    fv = init_unet(fm, jax.random.key(0), input_size=188)
    fv = transplant_weights(tm, fv)
    return cfg, tm, fm, fv


def _forward_torch(tm, x_nhwc):
    xt = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    with torch.no_grad():
        return tm(xt).numpy().transpose(0, 2, 3, 1)


def test_logit_parity_188(paired_models):
    cfg, tm, fm, fv = paired_models
    rs = np.random.RandomState(1)
    x = rs.rand(2, 188, 188, 1).astype(np.float32)
    ours = np.asarray(fm.apply(fv, jnp.asarray(x), train=False))
    ref = _forward_torch(tm, x)
    assert ours.shape == ref.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_folded_logit_parity_188(paired_models):
    cfg, tm, fm, fv = paired_models
    rs = np.random.RandomState(2)
    x = rs.rand(1, 188, 188, 1).astype(np.float32)
    fmodel, ffv = fold_batchnorm(cfg, fv)
    ours = np.asarray(fmodel.apply(ffv, jnp.asarray(x)))
    ref = _forward_torch(tm, x)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_pixel_agreement_threshold(paired_models):
    """Binary masks after softmax+0.5 threshold agree on >= 99.9% of pixels
    (identical weights, fp32)."""
    cfg, tm, fm, fv = paired_models
    rs = np.random.RandomState(3)
    pred = Predictor(
        model=fm, params=fv["params"], batch_stats=fv["batch_stats"],
        cfg=InferConfig(image_size=188, tile_input=188, normalize=False),
    )
    agree = 0
    total = 0
    for i in range(4):
        x = rs.rand(1, 188, 188, 1).astype(np.float32)
        ours = np.asarray(pred.probs(x[..., 0])) > 0.5
        ref_logits = _forward_torch(tm, x)
        e = np.exp(ref_logits - ref_logits.max(-1, keepdims=True))
        ref = (e[..., 1] / e.sum(-1)) > 0.5
        agree += (ours == ref).sum()
        total += ours.size
    assert agree / total >= 0.999, agree / total


@pytest.mark.slow
def test_logit_parity_full_width_512():
    """Full-width 512 -> 324 parity (the reference's exact flagship
    geometry). Slow: two ~31M-param forwards on CPU."""
    cfg = ModelConfig(compute_dtype="float32")
    tm = build_torch_unet(base=64)
    _randomize_bn_stats(tm)
    fm = UNet(cfg=cfg)
    fv = init_unet(fm, jax.random.key(0), input_size=188)  # shapes only
    fv = transplant_weights(tm, fv)
    x = np.random.RandomState(4).rand(1, 512, 512, 1).astype(np.float32)
    ours = np.asarray(fm.apply(fv, jnp.asarray(x), train=False))
    ref = _forward_torch(tm, x)
    assert ours.shape == ref.shape == (1, 324, 324, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    a = np.argmax(ours, -1)
    b = np.argmax(ref, -1)
    assert (a == b).mean() >= 0.999
