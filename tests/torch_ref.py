"""Test-only PyTorch model matching the reference U-Net architecture
(valid convs, BN, center-crop skips, transposed-conv up path) plus the
weight-transplant mapping into our Flax model. Used to prove numerical
parity of the whole network, not just single ops."""

from typing import Dict

import numpy as np


def build_torch_unet(base: int = 64, levels: int = 5, n_classes: int = 2):
    import torch
    import torch.nn as nn

    feats = [base * (2**i) for i in range(levels)]

    class DoubleConv(nn.Module):
        def __init__(s, i, o):
            super().__init__()
            s.block = nn.Sequential(
                nn.Conv2d(i, o, 3), nn.BatchNorm2d(o), nn.ReLU(True),
                nn.Conv2d(o, o, 3), nn.BatchNorm2d(o), nn.ReLU(True),
            )

        def forward(s, x):
            return s.block(x)

    class TorchUNet(nn.Module):
        def __init__(s):
            super().__init__()
            s.enc = nn.ModuleList(
                [DoubleConv(1 if i == 0 else feats[i - 1], feats[i]) for i in range(levels)]
            )
            s.pool = nn.MaxPool2d(2)
            s.up = nn.ModuleList(
                [nn.ConvTranspose2d(feats[i], feats[i] // 2, 2, 2) for i in range(levels - 1, 0, -1)]
            )
            s.dec = nn.ModuleList(
                [DoubleConv(feats[i], feats[i] // 2) for i in range(levels - 1, 0, -1)]
            )
            s.out = nn.Conv2d(feats[0], n_classes, 1)

        def forward(s, x):
            skips = []
            for i, e in enumerate(s.enc):
                if i:
                    x = s.pool(x)
                x = e(x)
                skips.append(x)
            x = skips[-1]
            for u, d, skip in zip(s.up, s.dec, reversed(skips[:-1])):
                x = u(x)
                h, w = x.shape[2:]
                H, W = skip.shape[2:]
                y0, x0 = max(0, (H - h) // 2), max(0, (W - w) // 2)
                x = d(torch.cat([skip[:, :, y0 : y0 + h, x0 : x0 + w], x], 1))
            return s.out(x)

    return TorchUNet().eval()


def transplant_weights(torch_model, flax_variables) -> Dict:
    """Copy torch weights into a flax variables pytree (returns a new tree).

    Layout mapping:
      Conv2d (O,I,kH,kW)        -> flax HWIO (kH,kW,I,O): transpose(2,3,1,0)
      ConvTranspose2d (I,O,kH,kW) -> flax (kH,kW,I,O) with spatial FLIP
      BatchNorm weight/bias/running_mean/var -> scale/bias/mean/var
    """
    import torch

    def np_(t):
        return t.detach().cpu().numpy()

    params = {k: dict(v) for k, v in flax_variables["params"].items()}
    stats = {k: dict(v) for k, v in flax_variables["batch_stats"].items()}
    levels = len(torch_model.enc)

    def set_block(name, torch_block):
        seq = torch_block.block
        convs = [seq[0], seq[3]]
        bns = [seq[1], seq[4]]
        blk_p = dict(params[name])
        blk_s = dict(stats[name])
        for i in range(2):
            blk_p[f"conv{i}"] = {
                "kernel": np_(convs[i].weight).transpose(2, 3, 1, 0),
                "bias": np_(convs[i].bias),
            }
            blk_p[f"bn{i}"] = {
                "scale": np_(bns[i].weight),
                "bias": np_(bns[i].bias),
            }
            blk_s[f"bn{i}"] = {
                "mean": np_(bns[i].running_mean),
                "var": np_(bns[i].running_var),
            }
        params[name] = blk_p
        stats[name] = blk_s

    for i in range(levels):
        set_block(f"enc{i}", torch_model.enc[i])
    for i in range(levels - 1):
        set_block(f"dec{i}", torch_model.dec[i])
        w = np_(torch_model.up[i].weight)  # (I, O, kH, kW)
        w = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()  # (kH,kW,I,O) flipped
        params[f"up{i}_tconv"] = {
            "kernel": w,
            "bias": np_(torch_model.up[i].bias),
        }
    params["outc"] = {
        "kernel": np_(torch_model.out.weight).transpose(2, 3, 1, 0),
        "bias": np_(torch_model.out.bias),
    }
    import jax.numpy as jnp

    to_jnp = lambda tree: {
        k: {kk: (jnp.asarray(vv) if not isinstance(vv, dict) else {
            k3: jnp.asarray(v3) for k3, v3 in vv.items()
        }) for kk, vv in v.items()} for k, v in tree.items()
    }
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
