"""Reference-checkpoint import: build a torch model with the reference's
exact module names, save its state_dict, convert, and verify forward parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.models.unet import UNet

torch = pytest.importorskip("torch")

from unetseg_tpu.utils.torch_import import (  # noqa: E402
    from_reference_state_dict,
    load_reference_checkpoint,
)

BASE = 4
SIZE = 188


def _reference_named_model():
    """Torch modules arranged with the reference's exact attribute names
    (reference: models/unet_model.py:5-85) so state_dict keys match."""
    import torch.nn as nn

    feats = [BASE * (2**i) for i in range(5)]

    class DoubleConv(nn.Module):
        def __init__(s, i, o):
            super().__init__()
            s.double_conv = nn.Sequential(
                nn.Conv2d(i, o, 3), nn.BatchNorm2d(o), nn.ReLU(True),
                nn.Conv2d(o, o, 3), nn.BatchNorm2d(o), nn.ReLU(True),
            )

        def forward(s, x):
            return s.double_conv(x)

    class Down(nn.Module):
        def __init__(s, i, o):
            super().__init__()
            s.maxpool_conv = nn.Sequential(nn.MaxPool2d(2), DoubleConv(i, o))

        def forward(s, x):
            return s.maxpool_conv(x)

    class Up(nn.Module):
        def __init__(s, i, skip, o):
            super().__init__()
            s.up = nn.ConvTranspose2d(i, i // 2, 2, 2)
            s.conv = DoubleConv(i // 2 + skip, o)

    class OutConv(nn.Module):
        def __init__(s, i, o):
            super().__init__()
            s.conv = nn.Conv2d(i, o, 1)

    class RefUNet(nn.Module):
        def __init__(s):
            super().__init__()
            s.inc = DoubleConv(1, feats[0])
            s.down1 = Down(feats[0], feats[1])
            s.down2 = Down(feats[1], feats[2])
            s.down3 = Down(feats[2], feats[3])
            s.down4 = Down(feats[3], feats[4])
            s.up1 = Up(feats[4], feats[3], feats[3])
            s.up2 = Up(feats[3], feats[2], feats[2])
            s.up3 = Up(feats[2], feats[1], feats[1])
            s.up4 = Up(feats[1], feats[0], feats[0])
            s.outc = OutConv(feats[0], 2)

        def forward(s, x):
            x1 = s.inc(x)
            x2 = s.down1(x1)
            x3 = s.down2(x2)
            x4 = s.down3(x3)
            x5 = s.down4(x4)

            def crop(f, target):
                h, w = f.shape[2:]
                th, tw = target.shape[2:]
                y0, x0 = max(0, (h - th) // 2), max(0, (w - tw) // 2)
                return f[:, :, y0 : y0 + th, x0 : x0 + tw]

            x = x5
            for up, skip in [(s.up1, x4), (s.up2, x3), (s.up3, x2), (s.up4, x1)]:
                xu = up.up(x)
                x = up.conv(torch.cat([crop(skip, xu), xu], 1))
            return s.outc.conv(x)

    m = RefUNet().eval()
    # non-trivial BN stats
    rs = np.random.RandomState(0)
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(torch.from_numpy(rs.randn(mod.num_features).astype("f") * 0.2))
                mod.running_var.copy_(torch.from_numpy((np.abs(rs.randn(mod.num_features)) + 0.5).astype("f")))
    return m


@pytest.fixture(scope="module")
def ref_model():
    return _reference_named_model()


def test_state_dict_converts_and_matches_forward(ref_model):
    variables = from_reference_state_dict(ref_model.state_dict())
    fm = UNet(cfg=ModelConfig(compute_dtype="float32", base_features=BASE))
    x = np.random.RandomState(1).rand(1, SIZE, SIZE, 1).astype(np.float32)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_load_pth_roundtrip(ref_model, tmp_path):
    p = str(tmp_path / "best_unet_model_epoch_18.pth")
    torch.save(ref_model.state_dict(), p)
    variables = load_reference_checkpoint(p)
    fm = UNet(cfg=ModelConfig(compute_dtype="float32", base_features=BASE))
    x = np.random.RandomState(2).rand(1, SIZE, SIZE, 1).astype(np.float32)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_missing_key_raises(ref_model):
    sd = dict(ref_model.state_dict())
    del sd["outc.conv.weight"]
    with pytest.raises(KeyError):
        from_reference_state_dict(sd)
