"""Serving export: serialize the inference function to a portable artifact.

The reference has no deployment story at all — consumers re-import the
training code and `torch.load` a state dict (reference: scripts/predict.py:
120-123). This module exports the *folded* inference forward (BN fused into
conv weights, bf16 compute — infer/folding.py) through `jax.export` to a
self-contained StableHLO artifact:

- weights are baked in as constants, so the artifact needs no Python model
  code, no checkpoint format, and no flax at load time — only jax;
- the batch axis is symbolic by default (`b`), so one artifact serves any
  batch size without recompiling the export;
- multi-platform lowering (`tpu` + `cpu` by default) makes the same bytes
  runnable on a TPU serving fleet and on CPU fallback hosts;
- the exported function is the normalized-probability tile forward
  `(b, S, S) float32 [0,1] -> (b, s', s') foreground probability` (or the
  full softmax for 3-class heads) with the predictor's normalization baked
  in, i.e. exactly what `Predictor.probs` computes.

The overlap-tile driver (infer/tiling.py) is plain host-side geometry; a
server reuses it unchanged around the exported tile function.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from unetseg_tpu.core.config import InferConfig, ModelConfig

# Symbolic-batch artifacts need calling-convention version >= 9 (shape
# polymorphism with dimension arguments); jax.export's own minimum
# supported version is already 9, so the floor holds by construction —
# export() takes no version argument to pin.


def make_serving_fn(
    model_cfg: ModelConfig,
    variables: Any,
    infer_cfg: Optional[InferConfig] = None,
    fold: bool = True,
):
    """The pure serving function `images (b, S, S) -> probs` with weights
    closed over (they become constants of the exported artifact)."""
    infer_cfg = infer_cfg or InferConfig()
    if fold and variables.get("batch_stats") is not None:
        from unetseg_tpu.infer.folding import fold_batchnorm

        fmodel, fvars = fold_batchnorm(model_cfg, variables, use_lanes=False)
        apply_fn = lambda x: fmodel.apply(fvars, x)
    else:
        from unetseg_tpu.models.unet import UNet

        model = UNet(cfg=model_cfg)
        apply_fn = lambda x: model.apply(variables, x, train=False)

    from unetseg_tpu.ops.losses import binary_probs_from_logits

    def serve(images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32)
        if infer_cfg.standardize:
            mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
            sd = jnp.maximum(jnp.std(x, axis=(-2, -1), keepdims=True), 1e-6)
            x = (x - mu) / sd
        elif infer_cfg.normalize:
            x = (x - infer_cfg.normalize_mean) / infer_cfg.normalize_std
        logits = apply_fn(x[..., None])
        if logits.shape[-1] == 3:
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return binary_probs_from_logits(logits)

    return serve


def export_inference(
    model_cfg: ModelConfig,
    variables: Any,
    infer_cfg: Optional[InferConfig] = None,
    image_size: Optional[int] = None,
    batch: Optional[int] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    fold: bool = True,
) -> bytes:
    """Serialize the inference forward to portable bytes.

    batch=None exports a symbolic batch dimension; an int pins it (needed
    only if a target runtime rejects shape polymorphism).
    """
    infer_cfg = infer_cfg or InferConfig()
    size = image_size or infer_cfg.image_size
    serve = make_serving_fn(model_cfg, variables, infer_cfg, fold=fold)
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, size, size), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, size, size), jnp.float32)
    exported = jax_export.export(
        jax.jit(serve), platforms=tuple(platforms)
    )(spec)
    return exported.serialize(vjp_order=0)


def save_exported(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str):
    """Deserialize an artifact -> callable `(images) -> probs`.

    Needs only jax at load time (no flax / model code / checkpoints)."""
    with open(path, "rb") as f:
        data = f.read()
    exported = jax_export.deserialize(data)

    def call(images) -> jax.Array:
        return exported.call(jnp.asarray(images, jnp.float32))

    call.exported = exported
    call.in_avals = exported.in_avals
    call.platforms = exported.platforms
    return call
