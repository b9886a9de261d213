"""Import reference PyTorch checkpoints.

Users of the reference train with scripts/train.py and hold `.pth` state
dicts keyed by its module names (reference: models/unet_model.py —
`inc.double_conv.{0,1,3,4}`, `down{k}.maxpool_conv.1.double_conv.*`,
`up{k}.up.*` (ConvTranspose2d), `up{k}.conv.double_conv.*`,
`outc.conv.*`). This converts such a checkpoint into our Flax variable tree
so existing models migrate without retraining.

Layout rules (verified by the weight-transplant parity tests):
  Conv2d   (O,I,kH,kW) -> HWIO transpose(2,3,1,0)
  ConvT2d  (I,O,kH,kW) -> (kH,kW,I,O) with the kernel spatially flipped
  BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _tconv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)  # (I,O,kH,kW)
    b = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
    w = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    return {"kernel": w, "bias": b}


def _bn(sd: Mapping[str, Any], prefix: str):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], dtype=np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], dtype=np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], dtype=np.float32),
    }
    return params, stats


def _double_conv(sd: Mapping[str, Any], prefix: str):
    """reference DoubleConv: Sequential(conv, bn, relu, conv, bn, relu)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.{ci}")
        p, s = _bn(sd, f"{prefix}.{bi}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def from_reference_state_dict(state_dict: Mapping[str, Any], levels: int = 5):
    """Reference state dict -> {'params': ..., 'batch_stats': ...} matching
    unetseg_tpu.models.unet.UNet's variable tree."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _double_conv(sd, "inc.double_conv")
    params["enc0"], stats["enc0"] = p, s
    for k in range(1, levels):
        p, s = _double_conv(sd, f"down{k}.maxpool_conv.1.double_conv")
        params[f"enc{k}"], stats[f"enc{k}"] = p, s
    for k in range(1, levels):
        i = k - 1
        params[f"up{k - 1}_tconv"] = _tconv(sd, f"up{k}.up")
        p, s = _double_conv(sd, f"up{k}.conv.double_conv")
        params[f"dec{i}"], stats[f"dec{i}"] = p, s
    params["outc"] = _conv(sd, "outc.conv")

    import jax.numpy as jnp

    to_dev = lambda tree: {
        k: (to_dev(v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in tree.items()
    }
    return {"params": to_dev(params), "batch_stats": to_dev(stats)}


def load_reference_checkpoint(path: str, levels: int = 5):
    """Load a reference .pth (torch.save(model.state_dict())) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_reference_state_dict(sd, levels=levels)
