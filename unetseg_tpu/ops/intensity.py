"""On-device photometric augmentation (gamma / illumination / noise).

The reference augments with elastic deformation only
(reference: utils/augmentations.py:4-39); its training and held-out
sequences differ visibly in contrast and illumination texture, which is a
dominant source of the generalization gap between DIC-C2DH-HeLa sequences
01 and 02. These augmentations model exactly those nuisance factors:

- **random gamma** — a per-item monotone nonlinearity ``img ** g`` with
  ``g = exp(U[-r, r])``. Survives per-frame standardization (z-scoring is
  affine; gamma is not), so the network actually sees it even when
  images are standardized afterwards.
- **low-frequency illumination** — a coarse random field, bilinearly
  upsampled, applied multiplicatively: shading/illumination gradients of
  the microscope that a *global* z-score cannot remove.
- **additive Gaussian noise** — applied after standardization (see
  train/steps.py) so its scale is in final-input units.

Everything is elementwise or tiny-resize work fused into the train step by
XLA; cost is negligible next to the convs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("gamma_log", "illum", "illum_cells"))
def photometric_augment_batch(
    key: jax.Array,
    images: jnp.ndarray,
    gamma_log: float = 0.0,
    illum: float = 0.0,
    illum_cells: int = 4,
) -> jnp.ndarray:
    """Per-item gamma + multiplicative low-frequency illumination.

    images: (B, H, W) float32 in [0, 1] (pre-standardization domain —
    gamma needs non-negative inputs). Either stage is skipped statically
    when its strength is 0.
    """
    b, h, w = images.shape
    kg, ki = jax.random.split(key)
    out = images
    if gamma_log > 0:
        g = jnp.exp(
            jax.random.uniform(
                kg, (b, 1, 1), minval=-gamma_log, maxval=gamma_log
            )
        )
        out = jnp.clip(out, 0.0, 1.0) ** g
    if illum > 0:
        coarse = jax.random.uniform(
            ki, (b, illum_cells, illum_cells), minval=-1.0, maxval=1.0
        )
        field = jax.image.resize(coarse, (b, h, w), method="bilinear")
        out = out * (1.0 + illum * field)
    return out


def gaussian_noise_batch(
    key: jax.Array, images: jnp.ndarray, max_std: float
) -> jnp.ndarray:
    """Additive Gaussian noise with a per-item std drawn U[0, max_std]
    (a light noise curriculum rather than a fixed level)."""
    b = images.shape[0]
    ks, kn = jax.random.split(key)
    sigma = jax.random.uniform(ks, (b, 1, 1), maxval=max_std)
    return images + sigma * jax.random.normal(kn, images.shape)


def standardize_batch(images: jnp.ndarray) -> jnp.ndarray:
    """Per-item z-score over (H, W) — the on-device equivalent of the
    host-side per-frame standardization the inference engine applies
    (infer/engine.py), so train-time inputs match inference exactly."""
    m = images.mean(axis=(1, 2), keepdims=True)
    s = images.std(axis=(1, 2), keepdims=True)
    return (images - m) / jnp.maximum(s, 1e-6)
