"""jit-compiled train / eval steps.

One fused device program per step: elastic augmentation (vmapped displacement
gathers) -> binarize -> U-Net forward (bf16 convs on the MXU) -> center-crop
targets -> weighted softmax-CE in fp32 -> backward -> SGD-momentum update.
The reference does augmentation on the host per item and only the
forward/backward on device (SURVEY.md §3.1); here nothing leaves HBM.

Padded batch items (see data/dataset.py) are masked out of the loss by
dividing by the number of *valid* pixels, which reproduces the reference's
plain `.mean()` over real items (reference: utils/losses.py:57).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from unetseg_tpu.models.unet import UNet
from unetseg_tpu.ops.elastic import elastic_deform_batch
from unetseg_tpu.ops.intensity import (
    gaussian_noise_batch,
    photometric_augment_batch,
    standardize_batch,
)
from unetseg_tpu.ops.losses import center_crop_nhw, per_pixel_ce
from unetseg_tpu.train.state import TrainState


def _masked_mean_loss(
    logits: jnp.ndarray,
    full_targets: jnp.ndarray,
    full_weights: Optional[jnp.ndarray],
    valid: jnp.ndarray,
    use_pallas: bool = False,
    n_pix: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """mean over valid items of (w * CE) with center-cropped targets
    (reference: scripts/train.py:118-128). With use_pallas, the per-pixel
    weighted CE (forward and backward) runs as the fused Pallas kernel in
    ops/pallas/wce.py. `n_pix` overrides the valid-pixel normalizer — the
    data-parallel shard_map step passes the GLOBAL count so that psumming
    the per-shard losses/grads reproduces the single-device mean."""
    th, tw = logits.shape[1], logits.shape[2]
    t = center_crop_nhw(full_targets, th, tw)
    if use_pallas and full_weights is not None:
        from unetseg_tpu.ops.pallas.wce import weighted_ce_pixels

        w = center_crop_nhw(full_weights, th, tw)
        ce = weighted_ce_pixels(logits, t, w)
    else:
        ce = per_pixel_ce(logits, t)
        if full_weights is not None:
            ce = ce * center_crop_nhw(full_weights, th, tw).astype(jnp.float32)
    item_mask = valid.astype(jnp.float32)[:, None, None]
    if n_pix is None:
        n_pix = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0) * th * tw
    return jnp.sum(ce * item_mask) / n_pix


def three_class_targets(masks: jnp.ndarray, halo: int = 2) -> jnp.ndarray:
    """Instance labels -> {0: background, 1: interior, 2: border} targets.

    A foreground pixel is *interior* iff its (2*halo+1)^2 window contains only
    its own label — computed as two reduce_windows (min == max) on the label
    map, so both cell-cell contacts and outer rims become the border class.
    The classic 3-class formulation for separating touching objects; an
    improvement the reference (binary-only) lacks."""
    m = masks.astype(jnp.int32)
    k = 2 * halo + 1
    big = 2**30

    def pool(x, init, op):
        return jax.lax.reduce_window(
            x, init, op, (1, k, k), (1, 1, 1), ((0, 0), (halo, halo), (halo, halo))
        )

    mn = pool(m, big, jax.lax.min)
    mx = pool(m, -big, jax.lax.max)
    fg = m > 0
    interior = fg & (mn == mx)
    return jnp.where(interior, 1, jnp.where(fg, 2, 0)).astype(jnp.int32)


def make_augmenter(
    augment: bool,
    elastic_alpha: float,
    elastic_sigma: float,
    three_class: bool,
    border_boost: float,
    standardize: bool,
    aug_gamma: float,
    aug_illum: float,
    aug_noise: float,
) -> Callable:
    """The train-step input pipeline as one traceable function:
    (images, masks, weights, key) -> (images, targets, weights).

    Augmentation order: elastic -> photometric (gamma/illumination, [0,1]
    domain) -> per-item standardization -> additive noise (final-input
    units). The elastic stage consumes `key` unchanged so augment-only runs
    reproduce earlier checkpoints bit-for-bit; the photometric/noise stages
    fold distinct constants into the same key. Shared by the single-device
    jit step and the shard_map data-parallel lanes step (the latter runs it
    under GSPMD *outside* shard_map so the key semantics stay identical)."""

    def apply(images, masks, weights, key):
        if augment:
            # Fresh field per item, image bilinear / labels nearest, weight
            # maps intentionally NOT deformed — all exactly the reference's
            # per-__getitem__ behavior (reference: utils/dataset.py:83-93).
            images, masks = elastic_deform_batch(
                key, images, masks, alpha=elastic_alpha, sigma=elastic_sigma
            )
            if aug_gamma > 0 or aug_illum > 0:
                images = photometric_augment_batch(
                    jax.random.fold_in(key, 1), images,
                    gamma_log=aug_gamma, illum=aug_illum,
                )
        if standardize:
            images = standardize_batch(images)
        if augment and aug_noise > 0:
            images = gaussian_noise_batch(
                jax.random.fold_in(key, 2), images, aug_noise
            )
        if three_class:
            targets = three_class_targets(masks)
            if border_boost != 1.0:
                # the border class is rare; boost its pixels in the weight
                # map so the loss actually prices separation errors
                weights = jnp.where(
                    targets == 2, weights * border_boost, weights
                )
        else:
            targets = (masks > 0).astype(jnp.int32)
        return images, targets, weights

    return apply


#: jax.checkpoint policies selectable by name for the train-step forward.
REMAT_POLICIES = {
    "dots": lambda: jax.checkpoint_policies.checkpoint_dots,
    "dots_no_batch": lambda: jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
    "nothing": lambda: jax.checkpoint_policies.nothing_saveable,
}


def make_train_step(
    model: UNet,
    augment: bool = True,
    elastic_alpha: float = 2000.0,
    elastic_sigma: float = 20.0,
    donate: bool = True,
    use_pallas_loss: bool = False,
    three_class: bool = False,
    border_boost: float = 1.0,
    standardize: bool = False,
    aug_gamma: float = 0.0,
    aug_illum: float = 0.0,
    aug_noise: float = 0.0,
    remat: Optional[str] = None,
    lanes: bool = False,
    jit: bool = True,
    assume_valid: bool = False,
) -> Callable:
    """Build the jitted train step.

    step(state, images (B,H,W) f32[0,1], masks (B,H,W) i32 instance labels,
         weights (B,H,W) f32, valid (B,) bool, key) -> (state, metrics)

    `assume_valid` statically promises every batch item is real (the feed
    divides evenly — true for the recipe: 152 items / batch 4), so the
    BatchNorm item masking and its backward select_n passes over every
    activation disappear from the program. The `valid` argument is still
    accepted (and still weights the loss) but no longer reaches BN.

    Augmentation order: elastic -> photometric (gamma/illumination, [0,1]
    domain) -> per-item standardization -> additive noise (final-input
    units). The elastic stage consumes `key` unchanged so augment-only runs
    reproduce earlier checkpoints bit-for-bit; the photometric/noise stages
    fold distinct constants into the same key.
    """

    augmenter = make_augmenter(
        augment, elastic_alpha, elastic_sigma, three_class, border_boost,
        standardize, aug_gamma, aug_illum, aug_noise,
    )

    def step(state: TrainState, images, masks, weights, valid, key):
        images, targets, weights = augmenter(images, masks, weights, key)
        bn_mask = None if assume_valid else valid

        if lanes:
            # lanes-native hot stages (enc0/up3/dec3 as Pallas custom-VJP
            # kernels, models/lanes_train.py) — same math as model.apply,
            # parity pinned by tests/test_lanes_train.py
            from unetseg_tpu.models.lanes_train import train_forward_lanes

            def forward(params, images):
                return train_forward_lanes(
                    params, state.batch_stats, images[..., None],
                    model.cfg, item_mask=bn_mask,
                )
        else:
            def forward(params, images):
                logits, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    images[..., None],
                    train=True,
                    item_mask=bn_mask,
                    mutable=["batch_stats"],
                )
                return logits, mutated["batch_stats"]

        if remat is not None:
            # Rematerialize the forward in the backward pass instead of
            # saving every intermediate: the saved residuals (ReLU outputs,
            # BN-normalized maps) are what drives the ~20 ms/step of layout
            # "data formatting" copies around the big-spatial low-C stages
            # (profiled; docs/PARITY.md). Policy "dots" keeps conv outputs
            # and recomputes the cheap elementwise chains.
            forward = jax.checkpoint(forward, policy=REMAT_POLICIES[remat]())

        def loss_fn(params):
            logits, new_bs = forward(params, images)
            loss = _masked_mean_loss(
                logits, targets, weights, valid, use_pallas=use_pallas_loss
            )
            return loss, new_bs

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_batch_stats)
        gnorm = optax_global_norm(grads)
        return state, {"loss": loss, "grad_norm": gnorm}

    if not jit:
        return step
    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_epoch_train_step(
    model: UNet, donate: bool = True, mesh=None, inner_step=None, **step_kw
) -> Callable:
    """Whole-epoch train step over a DEVICE-RESIDENT dataset.

    The reference feeds each batch from the host through a torch DataLoader
    (reference: scripts/train.py:88-104); over this chip's remote tunnel that
    costs ~12 MB and several dispatch round-trips per step — measured 0.5-0.6
    steps/s wall against a ~20 steps/s device program. TPU-first shape: put
    the whole dataset in HBM once (~480 MB for 152 frames, see
    data/dataset.py) and lax.scan the per-step program over an epoch's worth
    of batch indices, so an entire epoch is ONE dispatch and the only
    per-epoch upload is the (S, B) int32 index matrix.

    epoch_step(state, images_all (N,H,W) f32, masks_all (N,H,W) i32,
               wmaps_all (N,H,W) f32, idx (S,B) i32, valid (S,B) bool,
               key) -> (state, {"loss": (S,), "grad_norm": (S,)})

    Per-step randomness is fold_in(key, step-within-epoch), with the epoch
    already folded into `key` by the caller — deterministic in (seed,
    epoch) and bit-stable across resume at epoch granularity (the legacy
    host-fed loop advanced one global split chain instead, so fixed-seed
    runs differ bit-wise between the two feed modes and are NOT
    resume-stable).

    mesh (a core.mesh.MeshSpec) turns on GSPMD data parallelism: the
    dataset lives replicated, each gathered batch is sharding-constrained
    over the data axis, and XLA partitions the step (same program the
    host-fed mesh path compiles, minus the per-step host transfer).

    inner_step overrides the per-step program (same signature as a
    make_train_step(jit=False) step) — parallel/sharding's shard_map lanes
    step feeds through here so both device-resident paths share one scan
    body."""
    inner = inner_step or make_train_step(
        model, donate=False, jit=False, **step_kw
    )

    def epoch_step(state, images_all, masks_all, wmaps_all, idx, valid, key):
        def body(st, xs):
            ib, vb, i = xs
            step_key = jax.random.fold_in(key, i)
            imgs = jnp.take(images_all, ib, axis=0)
            msks = jnp.take(masks_all, ib, axis=0)
            wms = jnp.take(wmaps_all, ib, axis=0)
            if mesh is not None:
                bs = mesh.batch_sharding()
                imgs = jax.lax.with_sharding_constraint(imgs, bs)
                msks = jax.lax.with_sharding_constraint(msks, bs)
                wms = jax.lax.with_sharding_constraint(wms, bs)
                vb = jax.lax.with_sharding_constraint(vb, bs)
            st, metrics = inner(st, imgs, msks, wms, vb, step_key)
            return st, metrics

        steps = jnp.arange(idx.shape[0], dtype=jnp.int32)
        state, ms = jax.lax.scan(body, state, (idx, valid, steps))
        return state, ms

    return jax.jit(epoch_step, donate_argnums=(0,) if donate else ())


def make_epoch_eval_step(model: UNet, mesh=None, **eval_kw) -> Callable:
    """Whole-validation eval scan over the device-resident dataset
    (companion of make_epoch_train_step; same gather-by-index protocol
    and mesh semantics).

    epoch_eval(state, images_all, masks_all, idx (S,B) i32,
               valid (S,B) bool) -> {"val_loss": (S,), ...}"""
    inner = make_eval_step(model, jit=False, **eval_kw)

    def epoch_eval(state, images_all, masks_all, idx, valid):
        def body(_, xs):
            ib, vb = xs
            imgs = jnp.take(images_all, ib, axis=0)
            msks = jnp.take(masks_all, ib, axis=0)
            if mesh is not None:
                bs = mesh.batch_sharding()
                imgs = jax.lax.with_sharding_constraint(imgs, bs)
                msks = jax.lax.with_sharding_constraint(msks, bs)
                vb = jax.lax.with_sharding_constraint(vb, bs)
            m = inner(state, imgs, msks, vb)
            return None, m

        _, ms = jax.lax.scan(body, None, (idx, valid))
        return ms

    return jax.jit(epoch_eval)


def make_eval_step(
    model: UNet, three_class: bool = False, standardize: bool = False,
    jit: bool = True,
) -> Callable:
    """Validation step: *unweighted* CE on cropped targets, eval-mode BN
    (reference: scripts/train.py:141-163). val_iou is always the binary
    foreground IoU (classes {1,2} count as foreground in 3-class mode)."""

    def step(state: TrainState, images, masks, valid):
        if standardize:
            images = standardize_batch(images)
        if three_class:
            targets = three_class_targets(masks)
        else:
            targets = (masks > 0).astype(jnp.int32)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images[..., None],
            train=False,
        )
        loss = _masked_mean_loss(logits, targets, None, valid)
        # pixel accuracy + foreground IoU as extra observability
        th, tw = logits.shape[1], logits.shape[2]
        t = center_crop_nhw(targets, th, tw)
        pred = jnp.argmax(logits, axis=-1)
        item = valid[:, None, None]
        acc = jnp.sum((pred == t) & item) / jnp.maximum(
            jnp.sum(valid) * th * tw, 1
        )
        pred_fg = pred >= 1
        t_fg = t >= 1
        inter = jnp.sum(pred_fg & t_fg & item)
        union = jnp.sum((pred_fg | t_fg) & item)
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)
        return {"val_loss": loss, "val_acc": acc, "val_iou": iou}

    return jax.jit(step) if jit else step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
