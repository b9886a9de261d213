"""Flax implementation of the original valid-convolution U-Net.

Re-designed TPU-first from the behavior of the reference PyTorch model
(reference: models/unet_model.py):

- 5-level encoder-decoder, channels 64->128->256->512->1024
  (reference :73-77), two *valid* (unpadded) 3x3 convs + BatchNorm + ReLU per
  block (reference :11-17), 2x2 max-pool downsampling (reference :28),
  transposed-conv k=2 s=2 up path by default or bilinear align-corners
  upsampling (reference :41,:45), center-cropped skip concatenation
  (reference :88-102,:129-143), 1x1 output conv to `num_classes` logits
  (reference :56-63).
- Kaiming-normal (fan_out, relu) conv init with zero bias, BatchNorm scale 1 /
  bias 0 (reference: scripts/train.py:54-61).

TPU-first choices (not in the reference): NHWC layout so XLA tiles convs
directly onto the MXU; a dtype policy with fp32 parameters + BatchNorm
statistics and configurable (default bf16) conv compute; static-shape center
crops derived from the closed-form shape algebra in
`unetseg_tpu.models.shapes` instead of runtime `.size()` probing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.models.shapes import center_crop_bounds

# Kaiming-normal, fan_out, relu — matches the reference's init_weights
# (reference: scripts/train.py:54-58).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, mode="fan_out", distribution="normal"
)


def center_crop_nhwc(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """Center-crop an NHWC tensor to (th, tw) with the reference's bounds
    (start = max(0, (s - t) // 2), reference: models/unet_model.py:97-99)."""
    h, w = x.shape[1], x.shape[2]
    h0, h1 = center_crop_bounds(h, th)
    w0, w1 = center_crop_bounds(w, tw)
    return x[:, h0:h1, w0:w1, :]


def upsample_bilinear_align_corners(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """2x bilinear upsampling with align_corners=True semantics
    (reference: models/unet_model.py:41 uses nn.Upsample(align_corners=True)).

    jax.image.resize uses half-pixel centers, so build the gather directly:
    out[i] samples input at i * (in - 1) / (out - 1).
    """
    n, h, w, c = x.shape
    oh, ow = h * factor, w * factor

    def axis_weights(in_size: int, out_size: int):
        if in_size == 1:
            lo = jnp.zeros((out_size,), jnp.int32)
            frac = jnp.zeros((out_size,), x.dtype)
            return lo, lo, frac
        pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        lo = jnp.clip(lo, 0, in_size - 2)
        frac = (pos - lo.astype(jnp.float32)).astype(x.dtype)
        return lo, lo + 1, frac

    hlo, hhi, hf = axis_weights(h, oh)
    wlo, whi, wf = axis_weights(w, ow)

    top = x[:, hlo, :, :] * (1 - hf)[None, :, None, None] + x[:, hhi, :, :] * hf[None, :, None, None]
    out = (
        top[:, :, wlo, :] * (1 - wf)[None, None, :, None]
        + top[:, :, whi, :] * wf[None, None, :, None]
    )
    return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (N, H, W) with an optional per-item validity mask.

    Batches are padded to a static size for jit (see data/dataset.py); plain
    BatchNorm would fold the padding items into the batch statistics. This
    norm weights the statistics by `item_mask` so padded items are inert,
    and with a full mask it is exactly standard BatchNorm. Statistics are
    computed and stored in fp32; running variance uses torch's unbiased
    update (n/(n-1)) for behavioral parity with the reference's
    nn.BatchNorm2d (reference: models/unet_model.py:12,16).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool,
        item_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        # Statistics accumulate in fp32 WITHOUT materializing an fp32 copy of
        # the activations (one-pass E[x^2] - E[x]^2): under bf16 the naive
        # x.astype(f32) doubles HBM traffic for every layer and dominated the
        # train step. Elementwise normalization stays in the input dtype with
        # per-channel fp32 scalars folded to a single multiply-add.
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if item_mask is None:
                mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
                mean_sq = jnp.mean(
                    jnp.square(x), axis=(0, 1, 2), dtype=jnp.float32
                )
                n = jnp.float32(x.shape[0] * x.shape[1] * x.shape[2])
            else:
                w = item_mask.astype(x.dtype)[:, None, None, None]
                n = jnp.maximum(
                    jnp.sum(item_mask.astype(jnp.float32)) * x.shape[1] * x.shape[2],
                    1.0,
                )
                mean = jnp.sum(x * w, axis=(0, 1, 2), dtype=jnp.float32) / n
                mean_sq = (
                    jnp.sum(jnp.square(x) * w, axis=(0, 1, 2), dtype=jnp.float32) / n
                )
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbias = n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var * unbias
                )

        inv = jax.lax.rsqrt(var + self.epsilon)
        a = scale * inv
        b = bias - mean * a
        if x.dtype == jnp.float32:
            return x * a + b
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class DoubleConv(nn.Module):
    """(valid 3x3 conv -> BN -> ReLU) x2 (reference: models/unet_model.py:5-21).

    BatchNorm runs in fp32 regardless of the conv compute dtype so running
    statistics stay accurate under bf16.
    """

    features: int
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        item_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="VALID",
                use_bias=True,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                kernel_init=kaiming_normal_fan_out,
                bias_init=nn.initializers.zeros,
                name=f"conv{i}",
            )(x)
            x = MaskedBatchNorm(
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                name=f"bn{i}",
            )(x, use_running_average=not train, item_mask=item_mask)
            x = nn.relu(x).astype(self.compute_dtype)
        return x


class UNet(nn.Module):
    """The full valid-conv U-Net. Input NHWC (N, H, W, in_channels); output
    logits (N, H', W', num_classes) with H' = H - margin(H)."""

    cfg: ModelConfig = ModelConfig()

    @property
    def encoder_features(self) -> Tuple[int, ...]:
        return tuple(self.cfg.base_features * (2**i) for i in range(self.cfg.levels))

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        item_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        feats = self.encoder_features
        x = x.astype(dtype)

        # ---------------------------------------------------------- encoder
        skips = []
        for lvl, f in enumerate(feats):
            if lvl > 0:
                # 2x2 max-pool stride 2, VALID: floors odd sizes like torch
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            x = DoubleConv(
                f,
                compute_dtype=dtype,
                bn_momentum=cfg.bn_momentum,
                bn_epsilon=cfg.bn_epsilon,
                name=f"enc{lvl}",
            )(x, train=train, item_mask=item_mask)
            skips.append(x)

        # ---------------------------------------------------------- decoder
        x = skips[-1]
        for i, skip in enumerate(reversed(skips[:-1])):
            in_feats = x.shape[-1]
            if cfg.bilinear:
                x = upsample_bilinear_align_corners(x, 2)
                up_feats = in_feats
            else:
                x = nn.ConvTranspose(
                    in_feats // 2,
                    kernel_size=(2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    kernel_init=kaiming_normal_fan_out,
                    bias_init=nn.initializers.zeros,
                    name=f"up{i}_tconv",
                )(x)
                up_feats = in_feats // 2
            skip_c = center_crop_nhwc(skip, x.shape[1], x.shape[2])
            # Reference concatenates [skip, upsampled] in that order
            # (reference: models/unet_model.py:131).
            x = jnp.concatenate([skip_c, x.astype(dtype)], axis=-1)
            x = DoubleConv(
                skip.shape[-1],
                compute_dtype=dtype,
                bn_momentum=cfg.bn_momentum,
                bn_epsilon=cfg.bn_epsilon,
                name=f"dec{i}",
            )(x, train=train, item_mask=item_mask)

        # 1x1 output conv (reference: models/unet_model.py:56-63). Logits in
        # fp32 — the loss and argmax want full precision.
        logits = nn.Conv(
            cfg.num_classes,
            kernel_size=(1, 1),
            padding="VALID",
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal_fan_out,
            bias_init=nn.initializers.zeros,
            name="outc",
        )(x.astype(jnp.float32))
        return logits


def create_unet(cfg: Optional[ModelConfig] = None) -> UNet:
    return UNet(cfg=cfg or ModelConfig())


def init_unet(
    model: UNet,
    rng: jax.Array,
    input_size: int = 512,
    batch: int = 1,
) -> Dict[str, Any]:
    """Initialise variables ({'params', 'batch_stats'}) with a dummy batch."""
    x = jnp.zeros((batch, input_size, input_size, model.cfg.in_channels), jnp.float32)
    return model.init({"params": rng}, x, train=False)


def param_count(variables: Dict[str, Any]) -> int:
    return sum(p.size for p in jax.tree.leaves(variables["params"]))
