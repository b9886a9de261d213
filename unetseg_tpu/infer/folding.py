"""BatchNorm folding for the inference fast path.

In eval mode BatchNorm is a per-channel affine transform, so it folds into
the preceding convolution:

    W' = W * gamma / sqrt(var + eps)        (per output channel)
    b' = (b - mean) * gamma / sqrt(var + eps) + beta

The training model keeps fp32 BN statistics for accuracy (models/unet.py);
at inference those fp32 round-trips between bf16 convs cost real HBM
bandwidth on every layer. Folding removes every normalization op and lets
the whole network run conv+relu in bf16 end-to-end — same math, measurably
faster (see bench.py). Parity with the unfolded model is tested to bf16
tolerance in tests/test_folding.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.models.unet import (
    UNet,
    center_crop_nhwc,
    kaiming_normal_fan_out,
    upsample_bilinear_align_corners,
)


class PackableConv3x3(nn.Module):
    """3x3 VALID conv that switches to the width-packed formulation (see
    ops/packed_conv.py) when the output channels underfill the vector lanes
    and the width is even — bit-equivalent, ~2x faster for C=64 stages."""

    features: int
    compute_dtype: Any = jnp.bfloat16
    use_packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from unetseg_tpu.ops.packed_conv import packed_conv3x3_valid, should_pack

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xb = x.astype(self.compute_dtype)
        k = kernel.astype(self.compute_dtype)
        if cin == 1:
            # Stem conv: XLA's conv lowering of a 1-channel input is pure
            # data formatting (profiled 1.85 ms / 2.6 TF/s for 16 512-tiles).
            # im2col is cheap at C=1: 9 shifted views -> one K=9 dot.
            b, h, w, _ = xb.shape
            patches = jnp.concatenate(
                [
                    xb[:, dy : h - 2 + dy, dx : w - 2 + dx, :]
                    for dy in range(3)
                    for dx in range(3)
                ],
                axis=-1,
            )
            y = jax.lax.dot_general(
                patches, k.reshape(9, self.features),
                (((3,), (0,)), ((), ())),
                preferred_element_type=self.compute_dtype,
            )
            return y + bias.astype(self.compute_dtype)
        if self.use_packed and should_pack(x.shape[2], self.features, cin):
            return packed_conv3x3_valid(xb, k, bias)
        dn = jax.lax.conv_dimension_numbers(
            xb.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xb, k, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=self.compute_dtype,
        )
        return y + bias.astype(self.compute_dtype)


class _ConvParams(nn.Module):
    """Parameter-only conv submodule: keeps the folded param tree identical
    (enc0/conv0/kernel, ...) while the fused lanes path executes outside the
    per-conv module structure."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class FoldedDoubleConv(nn.Module):
    """(valid 3x3 conv -> ReLU) x2 — BN already folded into the weights.

    With use_lanes (TPU), low-channel stages run as the Pallas fused
    conv+bias+ReLU kernel in the (H, C, B*W) lanes layout with a single
    layout round-trip for the whole block (ops/pallas/conv3x3.py) — XLA's
    own lowering of these convs is data-formatting-bound (2.6x slower,
    docs/PARITY.md)."""

    features: int
    compute_dtype: Any = jnp.bfloat16
    use_packed: bool = False
    use_lanes: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_lanes and self.features <= 64:
            from unetseg_tpu.ops.pallas.conv3x3 import double_conv_lanes

            k0, b0 = _ConvParams(self.features, name="conv0")(x.shape[-1])
            k1, b1 = _ConvParams(self.features, name="conv1")(self.features)
            return double_conv_lanes(
                x.astype(self.compute_dtype), k0, b0, k1, b1
            )
        for i in range(2):
            x = PackableConv3x3(
                self.features, compute_dtype=self.compute_dtype,
                use_packed=self.use_packed, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        return x


class _OutConv1x1(nn.Module):
    """1x1 logits head: bf16 operands, f32 accumulation — parameter tree
    identical to nn.Conv (outc/{kernel,bias}) so folded checkpoints load
    unchanged."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y + bias


class FoldedUNet(nn.Module):
    """Inference-only U-Net with identical topology and folded parameters."""

    cfg: ModelConfig = ModelConfig()
    use_packed: bool = False
    use_lanes: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        feats = tuple(cfg.base_features * (2**i) for i in range(cfg.levels))
        x = x.astype(dtype)

        skips = []
        for lvl, f in enumerate(feats):
            if lvl > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = FoldedDoubleConv(
                f, compute_dtype=dtype, use_packed=self.use_packed,
                use_lanes=self.use_lanes, name=f"enc{lvl}",
            )(x)
            skips.append(x)

        x = skips[-1]
        for i, skip in enumerate(reversed(skips[:-1])):
            in_feats = x.shape[-1]
            if cfg.bilinear:
                x = upsample_bilinear_align_corners(x, 2)
            else:
                x = nn.ConvTranspose(
                    in_feats // 2, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=dtype, param_dtype=jnp.float32, name=f"up{i}_tconv",
                )(x)
            skip_c = center_crop_nhwc(skip, x.shape[1], x.shape[2])
            x = jnp.concatenate([skip_c, x.astype(dtype)], axis=-1)
            x = FoldedDoubleConv(
                skip.shape[-1], compute_dtype=dtype, use_packed=self.use_packed,
                use_lanes=self.use_lanes, name=f"dec{i}",
            )(x)

        # 1x1 head reading bf16 activations, f32 accumulation/output: an f32
        # head re-reads the whole 64-channel activation at double width for
        # 0.4 GFLOP of work — profiled at 1.64 ms of pure HBM bandwidth per
        # 16 tiles (5% of the forward).
        return _OutConv1x1(cfg.num_classes, name="outc")(x)


def _fold_block(block_params: Dict, block_stats: Dict, eps: float) -> Dict:
    out = {}
    for i in range(2):
        conv = block_params[f"conv{i}"]
        bn = block_params[f"bn{i}"]
        stats = block_stats[f"bn{i}"]
        inv = bn["scale"] / jnp.sqrt(stats["var"] + eps)
        out[f"conv{i}"] = {
            "kernel": conv["kernel"] * inv[None, None, None, :],
            "bias": (conv["bias"] - stats["mean"]) * inv + bn["bias"],
        }
    return out


def fold_batchnorm(
    model_cfg: ModelConfig,
    variables: Dict[str, Any],
    use_packed: bool = False,
    use_lanes: Optional[bool] = None,
) -> Tuple[FoldedUNet, Dict[str, Any]]:
    """(FoldedUNet, folded variables) from a trained model's variables.

    use_lanes opts into the Pallas lanes conv kernel (TPU only). Isolated it
    is 2.6x faster than XLA's C=64 conv (1.76 vs 4.61 ms on the enc0b
    shape), but in the full tiled-inference program the NHWC<->lanes
    boundary transposes cost more than the kernel saves (32.6 -> 18-20
    MPix/s measured), so it ships OFF; the round-3 route is keeping the
    whole network in the lanes layout. UNETSEG_PALLAS_CONV=1 forces it on."""
    if use_lanes is None:
        import os

        use_lanes = (
            jax.default_backend() == "tpu"
            and bool(os.environ.get("UNETSEG_PALLAS_CONV"))
        )
    params = variables["params"]
    stats = variables["batch_stats"]
    eps = model_cfg.bn_epsilon
    folded: Dict[str, Any] = {}
    for name, block in params.items():
        if name.startswith(("enc", "dec")):
            folded[name] = _fold_block(block, stats[name], eps)
        else:  # outc, up{i}_tconv — no BN attached
            folded[name] = block
    return (
        FoldedUNet(cfg=model_cfg, use_packed=use_packed, use_lanes=use_lanes),
        {"params": folded},
    )
