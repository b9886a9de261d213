"""Inference engine: single image, batched sequence, and overlap-tile paths.

Covers the reference's two inference scripts and the tile strategy it never
implemented:

- single-image path (reference: scripts/inference.py — resize 512, forward,
  threshold 0.5),
- sequence path (reference: scripts/predict.py — resize 512,
  Normalize(0.5, 0.5), softmax fg channel, threshold, mask{NNN}.tif 0/255 +
  connected-component m{NNN}.tif uint16; outputs are 324x324),
- overlap-tile path producing *full-resolution* seamless probability maps for
  arbitrary image sizes (see infer/tiling.py), batched and mesh-shardable.

TPU-first: frames are batched (the reference runs batch=1 serially,
reference: scripts/predict.py:73), compute is one jitted NHWC program per
static shape, thresholding/softmax stay on device; only final masks return to
host for file IO and component labeling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from unetseg_tpu.core.config import InferConfig, ModelConfig
from unetseg_tpu.core.mesh import MeshSpec
from unetseg_tpu.data.io import (
    file_number_str,
    frame_number,
    sorted_frames,
    write_mask_u16,
    write_mask_u8,
)
from unetseg_tpu.infer.tiling import make_tiled_fn, plan_tiles
from unetseg_tpu.models.unet import UNet
from unetseg_tpu.ops.losses import binary_probs_from_logits
from unetseg_tpu.post.cc import get_instance_masks


def _resize_nearest_binary(mask: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor resize of a {0,1} uint8 mask to (size, size)."""
    return np.asarray(
        Image.fromarray(mask * 255).resize((size, size), Image.NEAREST)
    ) // 255


def load_image_01(path: str, image_size: Optional[int] = None) -> np.ndarray:
    """Grayscale [0,1], optional bilinear resize — torchvision ToTensor +
    Resize semantics (reference: scripts/predict.py:76-77)."""
    img = Image.open(path).convert("L")
    if image_size is not None and img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


@dataclass
class Predictor:
    """Holds the model + trained variables and compiled forwards."""

    model: UNet
    params: Any
    batch_stats: Any
    cfg: InferConfig = field(default_factory=InferConfig)
    mesh: Optional[MeshSpec] = None
    # Fold BatchNorm into conv weights for the eval path (see infer/folding):
    # same math, all-bf16 conv+relu, measurably faster. Disable to run the
    # training graph verbatim.
    fold: bool = True
    # Width-packed convs for the 64-channel stages (ops/packed_conv.py).
    packed: bool = False

    def __post_init__(self):
        # fail at construction, not with a KeyError deep inside a tiled
        # predict: the merge registries live in infer/tiling.py
        from unetseg_tpu.infer.tiling import TTA_TRANSFORMS

        if self.cfg.tta not in TTA_TRANSFORMS:
            raise ValueError(
                f"InferConfig.tta={self.cfg.tta!r}; expected one of "
                f"{sorted(TTA_TRANSFORMS)}"
            )
        for name in ("tta_merge", "ensemble_merge"):
            v = getattr(self.cfg, name, "mean")
            allowed = {"mean", "gmean", "vote", "max"}
            if name == "ensemble_merge":
                allowed = {"mean", "gmean", "vote"}
            if v not in allowed:
                raise ValueError(
                    f"InferConfig.{name}={v!r}; expected one of {sorted(allowed)}"
                )
        # Variables are passed as jit ARGUMENTS, never closed over: closure
        # capture would inline ~62 MB of weights as compile-time constants
        # (slow remote compiles; once crashed the TPU tunnel backend).
        #
        # Ensemble: params/batch_stats may be LISTS (one entry per trained
        # seed). Member variable pytrees are stacked on a leading axis and
        # the single-net probability program is lax.map'ed over them with an
        # on-device mean — one trace, one weight upload, activations for one
        # member at a time. Every downstream path (overlap-tile, TTA,
        # device-CC, sequence) consumes the averaged _probs_raw unchanged.
        ensemble = isinstance(self.params, (list, tuple))
        members = (
            list(zip(self.params, self.batch_stats))
            if ensemble
            else [(self.params, self.batch_stats)]
        )
        if self.fold and all(bs is not None for _, bs in members):
            from unetseg_tpu.infer.folding import fold_batchnorm

            fmodel = None
            fvars_all = []
            for p, bs in members:
                fmodel, fv = fold_batchnorm(
                    self.model.cfg,
                    {"params": p, "batch_stats": bs},
                    use_packed=self.packed,
                )
                fvars_all.append(fv)
            self._variables = (
                jax.tree.map(lambda *xs: jnp.stack(xs), *fvars_all)
                if ensemble
                else fvars_all[0]
            )
            apply_fn = lambda v, x: fmodel.apply(v, x)
            if self._use_lanes_net():
                # Tier-1 lanes-native forward (infer/lanes_net.py): Pallas
                # kernels for the stages XLA runs below roofline. Pallas
                # calls can't be GSPMD-partitioned, so single-device only;
                # shapes are static under jit, so the geometry check happens
                # per traced input size with FoldedUNet as the fallback.
                from unetseg_tpu.infer.lanes_net import (
                    folded_forward_tier1,
                    supports,
                    supports_tier2,
                )

                cfg = self.model.cfg
                base_apply = apply_fn
                # Tier-2 (enc1/dec2 dense-layout kernels) measured SLOWER
                # in-context on the bench geometry (57.1/45.6 vs 62.2-62.6
                # MPix/s tier-1-only, r3 A/B) — opt-in, mirroring the train
                # path's tier-2 default.
                want_t2 = os.environ.get("UNETSEG_LANES_TIER2", "0") == "1"
                # HCNW middle (free lanes reshape, no boundary transposes):
                # measured 2 ms SLOWER in-context at the bench geometry
                # (68.5 vs 66.5 ms interleaved A/B) — XLA re-pays the saved
                # transposes in conv-adjacent layout copies plus an
                # unfusable W pad at the up3 entry. Kept opt-in.
                want_hcnw = os.environ.get("UNETSEG_MID_HCNW", "0") == "1"
                # Decoder-tail fusion granularity, r4 on-chip A/B at the
                # bench geometry: "head" (dec3 conv1 + 1x1 head one kernel)
                # 68.2 vs 67.3 MPix/s baseline — DEFAULT; "tail"
                # (conv0+conv1+head mega-kernel) 64.4, loses the skip-DMA/
                # compute overlap — opt-in. Fused enc0 (stem+conv1+pool)
                # measured a wash (67.36 vs 67.33; the stem HBM round-trip
                # it saves was already hidden under compute) — opt-in.
                want_fe0 = os.environ.get("UNETSEG_FUSED_ENC0", "0") == "1"
                dec_fuse = os.environ.get("UNETSEG_DEC_FUSE", "head")
                # cblock middle convs (in-VMEM im2col, conv_cblock.py):
                # "" off, "all", or a comma list of conv names
                # ("enc1c1,enc2c0,..."); r5 A/B pending
                cb_env = os.environ.get("UNETSEG_CBLOCK", "")
                cblock = frozenset(
                    t for t in cb_env.split(",") if t
                ) if cb_env else frozenset()

                def apply_fn(v, x):
                    if x.shape[1] == x.shape[2] and supports(cfg, x.shape[1]):
                        t2 = want_t2 and supports_tier2(cfg, x.shape[1])
                        return folded_forward_tier1(
                            v["params"], x, cfg, tier2=t2,
                            mid_hcnw=want_hcnw and not t2,
                            fused_enc0=want_fe0, dec_fuse=dec_fuse,
                            cblock=cblock,
                        )
                    return base_apply(v, x)
        else:
            dicts = [
                {"params": p, "batch_stats": bs} for p, bs in members
            ]
            self._variables = (
                jax.tree.map(lambda *xs: jnp.stack(xs), *dicts)
                if ensemble
                else dicts[0]
            )
            apply_fn = lambda v, x: self.model.apply(v, x, train=False)

        def _probs_one(variables, images: jnp.ndarray) -> jnp.ndarray:
            x = images
            if self.cfg.standardize:
                mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
                sd = jnp.maximum(jnp.std(x, axis=(-2, -1), keepdims=True), 1e-6)
                x = (x - mu) / sd
            elif self.cfg.normalize:
                x = (x - self.cfg.normalize_mean) / self.cfg.normalize_std
            logits = apply_fn(variables, x[..., None])
            if logits.shape[-1] == 3:
                # 3-class (bg / interior / border) head: return all probs;
                # the sequence path splits instances from interior markers
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return binary_probs_from_logits(logits)

        if ensemble:
            merge = getattr(self.cfg, "ensemble_merge", "mean")

            @jax.jit
            def _probs(variables, images: jnp.ndarray) -> jnp.ndarray:
                # combine member PROBABILITIES (post-softmax/sigmoid).
                # "mean" is the standard deep-ensemble combination but
                # smooths the thin membranes between touching cells where
                # members disagree (the same failure as TTA mean-merge);
                # "gmean" keeps a near-zero member vote authoritative.
                # "vote" thresholds each member and returns the pixel
                # majority as {0,1} probabilities (>0.5 test downstream
                # reproduces the member-majority mask for any threshold
                # downstream of 0/1).
                member = jax.lax.map(lambda v: _probs_one(v, images), variables)
                binary = member.ndim == 4  # (M, B, h, w); 3-class is 5-D
                if merge == "gmean" and binary:
                    return jnp.exp(
                        jnp.mean(jnp.log(member + 1e-7), axis=0)
                    )
                if merge == "vote" and binary:
                    votes = jnp.sum(member > self.cfg.threshold, axis=0)
                    return (votes * 2 > member.shape[0]).astype(jnp.float32)
                return jnp.mean(member, axis=0)

        else:
            _probs = jax.jit(_probs_one)

        self._probs_raw = _probs  # (variables, images) -> probs
        self._probs_fn = lambda images: _probs(self._variables, images)
        self._tiled_cache = {}
        self._labels_fn = None  # lazily-built device-CC program

    def _use_lanes_net(self) -> bool:
        if os.environ.get("UNETSEG_LANES_NET", "1") != "1":
            return False
        return jax.default_backend() == "tpu" and self.mesh is None

    # ------------------------------------------------------------- forward
    def probs(self, images: np.ndarray) -> jnp.ndarray:
        """(B, H, W) in [0,1] -> (B, h', w') foreground probability."""
        return self._probs_fn(jnp.asarray(images))

    def labels_device(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W) images -> raw connected-component labels (B, h', w')
        int32, computed entirely on device (probs -> threshold -> CC, see
        post/cc_device.py); pair with post.cc_device.compact_labels."""
        if self._labels_fn is None:
            from unetseg_tpu.post.cc_device import label_components_device

            probs_raw = self._probs_raw
            thr = self.cfg.threshold

            @jax.jit
            def _labels(variables, images: jnp.ndarray) -> jnp.ndarray:
                p = probs_raw(variables, images)
                fg = (p[..., 1] + p[..., 2] > thr) if p.ndim == 4 else (p > thr)
                return jax.vmap(label_components_device)(fg)

            self._labels_fn = _labels
        return np.asarray(self._labels_fn(self._variables, jnp.asarray(images)))

    def predict_image(self, image: np.ndarray) -> np.ndarray:
        """Single (H, W) image -> binary uint8 mask at the net's output size
        (reference: scripts/inference.py:79-95)."""
        p = self.probs(image[None])[0]
        return np.asarray(p > self.cfg.threshold, np.uint8)

    # --------------------------------------------------------- overlap-tile
    def probs_tiled(
        self,
        image: np.ndarray,
        tile_input: Optional[int] = None,
        tile_batch: Optional[int] = None,
    ) -> np.ndarray:
        """Full-resolution seamless probability map for an arbitrary-size
        image via the overlap-tile strategy."""
        h, w = image.shape
        t_in = tile_input or self.cfg.tile_input
        t_batch = tile_batch or self.cfg.tile_batch
        key = (h, w, t_in, t_batch)
        fn = self._tiled_cache.get(key)
        if fn is None:
            grid = plan_tiles(h, w, t_in)
            fn = make_tiled_fn(
                self._probs_raw, grid, tile_batch=t_batch, mesh=self.mesh,
                with_context=True,
            )
            self._tiled_cache[key] = fn
        return np.asarray(fn(self._variables, jnp.asarray(image, jnp.float32)))

    def predict_image_tiled(self, image: np.ndarray) -> np.ndarray:
        return (self.probs_tiled(image) > self.cfg.threshold).astype(np.uint8)

    def masks_tiled(
        self,
        images: np.ndarray,
        tile_input: Optional[int] = None,
        tile_batch: Optional[int] = None,
    ) -> np.ndarray:
        """Binary masks for a BATCH of frames in one device program:
        pad -> tile -> forward -> stitch -> threshold, all frames' tiles
        pooled into shared forward chunks, uint8 out.

        vs per-frame probs_tiled + host threshold this cuts the fetch 8x
        (uint8 masks instead of f32 probabilities) and amortizes the
        per-dispatch tunnel round-trip over the whole frame batch — the
        sequence-predict path was fetch-bound, not compute-bound."""
        f, h, w = images.shape
        t_in = tile_input or self.cfg.tile_input
        t_batch = tile_batch or self.cfg.tile_batch
        tta = self.cfg.tta
        tta_merge = getattr(self.cfg, "tta_merge", "mean")
        key = ("masks", f, h, w, t_in, t_batch, tta, tta_merge)
        fn = self._tiled_cache.get(key)
        if fn is None:
            from unetseg_tpu.infer.tiling import make_tiled_mask_batch_fn

            grid = plan_tiles(h, w, t_in)
            fn = make_tiled_mask_batch_fn(
                self._probs_raw, grid, n_frames=f,
                threshold=self.cfg.threshold,
                tile_batch=t_batch, mesh=self.mesh, tta=tta,
                tta_merge=tta_merge,
            )
            self._tiled_cache[key] = fn
        return np.asarray(fn(self._variables, jnp.asarray(images, jnp.float32)))

    # ------------------------------------------------------------ sequence
    def predict_sequence(
        self,
        input_dir: str,
        output_masks_dir: str,
        output_instance_dir: str,
        batch_size: Optional[int] = None,
        tiled: bool = False,
        resize_output_to: Optional[int] = None,
        progress: Optional[Callable[[int, int], None]] = None,
        watershed: bool = False,
        marker_frac: float = 0.5,
        device_cc: bool = False,
        temporal_markers: bool = False,
        temporal_bidi: bool = False,
    ) -> List[str]:
        """Predict every t*.tif frame -> mask{NNN}.tif + m{NNN}.tif
        (reference: scripts/predict.py:57-116). With `tiled=True` frames keep
        their native resolution (no resize, no valid-conv shrink).

        `resize_output_to` nearest-resizes the saved masks (the reference's
        324x324 outputs score SEG=0.0 against 512x512 GT — a documented
        defect, SURVEY.md §2; pass 512 to fix, None to reproduce faithfully).
        """
        os.makedirs(output_masks_dir, exist_ok=True)
        os.makedirs(output_instance_dir, exist_ok=True)
        frames = sorted_frames(input_dir, "t*.tif")
        if not frames:
            raise FileNotFoundError(f"no t*.tif frames in {input_dir}")

        if device_cc and (tiled or self.model.cfg.num_classes == 3):
            raise ValueError(
                "device_cc applies to the batched binary path only "
                "(tiled and 3-class predictions post-process on host)"
            )
        if temporal_markers and device_cc:
            raise ValueError(
                "temporal_markers re-seeds the host watershed from the "
                "previous frame and is incompatible with device_cc"
            )
        if temporal_bidi and not temporal_markers:
            raise ValueError("temporal_bidi refines the temporal_markers "
                             "pass; enable both")
        bs = batch_size or self.cfg.tile_batch
        written: List[str] = []
        prev_inst: Optional[np.ndarray] = None  # temporal-marker state
        # backward-pass buffers (frame number, binary, forward instances)
        bidi_frames: List[tuple] = []
        size = None if tiled else self.cfg.image_size
        for start in range(0, len(frames), bs):
            chunk = frames[start : start + bs]
            images = np.stack([load_image_01(f, size) for f in chunk])
            raw_labels = None
            tiled_masks = None
            if tiled:
                if self.model.cfg.num_classes == 3:
                    probs = np.stack([self.probs_tiled(img) for img in images])
                else:
                    # frame-batched device program incl. threshold: one
                    # dispatch + a uint8 fetch per chunk instead of a
                    # per-frame f32 probs fetch (the tunnel-bound path).
                    # Pad to the static batch so one compile serves the
                    # ragged last chunk.
                    pad = bs - len(chunk)
                    fb = (
                        np.concatenate([images, images[:1].repeat(pad, 0)])
                        if pad
                        else images
                    )
                    tiled_masks = self.masks_tiled(fb)[: len(chunk)]
                    probs = None
            else:
                pad = bs - len(chunk)
                batch = np.concatenate([images, images[:1].repeat(pad, 0)]) if pad else images
                if device_cc:
                    # probs -> threshold -> CC stays one device program; only
                    # the int32 label maps come back (binary = labels > 0)
                    raw_labels = self.labels_device(batch)[: len(chunk)]
                    probs = None
                else:
                    probs = np.asarray(self.probs(batch))[: len(chunk)]
            if raw_labels is not None:
                binary = (raw_labels > 0).astype(np.uint8)
                interior = None
            elif tiled_masks is not None:
                binary = tiled_masks
                interior = None
            elif probs.ndim == 4:  # three-class head
                fg_prob = probs[..., 1] + probs[..., 2]
                binary = (fg_prob > self.cfg.threshold).astype(np.uint8)
                interior = (np.argmax(probs, -1) == 1).astype(np.uint8)
            else:
                binary = (probs > self.cfg.threshold).astype(np.uint8)
                interior = None
            for k, f in enumerate(chunk):
                num = frame_number(f)
                b = binary[k]
                inter = interior[k] if interior is not None else None
                raw = raw_labels[k] if raw_labels is not None else None
                if resize_output_to is not None and b.shape[0] != resize_output_to:
                    b = _resize_nearest_binary(b, resize_output_to)
                    if inter is not None:
                        # Marker map must track the mask's geometry, else
                        # expand_markers sees mismatched shapes.
                        inter = _resize_nearest_binary(inter, resize_output_to)
                    if raw is not None:
                        # same NEAREST grid as the mask, so labels>0 == b and
                        # min_size is measured at the saved resolution (like
                        # the host path, which re-labels after the resize)
                        raw = np.asarray(
                            Image.fromarray(raw.astype(np.int32), mode="I")
                            .resize((resize_output_to, resize_output_to), Image.NEAREST)
                        )
                if inter is not None:
                    from unetseg_tpu.post.watershed import expand_markers

                    inst = expand_markers(
                        b, inter, min_size=self.cfg.min_cell_size
                    )
                elif temporal_markers:
                    # split under-segmented components with the previous
                    # frame's instance cores (post/temporal.py; the big NS
                    # reduction — docs/RESULTS.md)
                    from unetseg_tpu.post.temporal import temporal_instance_masks

                    inst = temporal_instance_masks(
                        b, prev_inst,
                        min_size=self.cfg.min_cell_size,
                        marker_frac=marker_frac,
                        area_guard=self.cfg.temporal_area_guard,
                    )
                    prev_inst = inst
                elif watershed:
                    from unetseg_tpu.post.watershed import get_instance_masks_watershed

                    inst = get_instance_masks_watershed(
                        b, min_size=self.cfg.min_cell_size,
                        marker_frac=marker_frac,
                    )
                elif raw is not None:
                    from unetseg_tpu.post.cc_device import compact_labels

                    inst = compact_labels(
                        raw, min_size=self.cfg.min_cell_size, relabel=False
                    )
                else:
                    inst = get_instance_masks(b, min_size=self.cfg.min_cell_size)
                mask_path = os.path.join(output_masks_dir, f"mask{num:03d}.tif")
                write_mask_u8(mask_path, b)
                written.append(mask_path)
                if temporal_bidi and len(bidi_frames) <= self.cfg.temporal_bidi_frames:
                    # defer instance writes for the sweep window only
                    # (frames past temporal_bidi_frames are provably
                    # untouched by the depth-bounded backward sweep, so
                    # they write immediately — a crash mid-sequence loses
                    # at most the first window)
                    bidi_frames.append((num, b, inst))
                else:
                    inst_path = os.path.join(
                        output_instance_dir, f"m{num:03d}.tif"
                    )
                    write_mask_u16(inst_path, self._grown(inst))
                    written.append(inst_path)
            if progress:
                progress(min(start + bs, len(frames)), len(frames))
        if temporal_bidi:
            from unetseg_tpu.post.temporal import refine_backward

            refined = refine_backward(
                [b for _, b, _ in bidi_frames],
                [i for _, _, i in bidi_frames],
                min_size=self.cfg.min_cell_size,
                marker_frac=marker_frac,
                area_guard=self.cfg.temporal_area_guard,
                max_frames=self.cfg.temporal_bidi_frames,
            )
            for (num, _, _), inst in zip(bidi_frames, refined):
                inst_path = os.path.join(
                    output_instance_dir, f"m{num:03d}.tif"
                )
                write_mask_u16(inst_path, self._grown(inst))
                written.append(inst_path)
        return written

    def _grown(self, inst: np.ndarray) -> np.ndarray:
        """Instance-write epilogue: the configured boundary grow
        (post/boundary.py). Applied only at write time so the temporal /
        bidi state machines always see ungrown instances."""
        if self.cfg.boundary_grow > 0:
            from unetseg_tpu.post.boundary import grow_instances

            return grow_instances(inst, self.cfg.boundary_grow)
        return inst

    # ------------------------------------------------------- construction
    @classmethod
    def from_torch_checkpoint(
        cls,
        path: str,
        model_cfg: Optional[ModelConfig] = None,
        infer_cfg: Optional[InferConfig] = None,
        mesh: Optional[MeshSpec] = None,
    ) -> "Predictor":
        """Load a reference-format .pth state dict (see utils/torch_import) —
        lets reference users run their existing trained models here."""
        from unetseg_tpu.utils.torch_import import load_reference_checkpoint

        model_cfg = model_cfg or ModelConfig()
        variables = load_reference_checkpoint(path, levels=model_cfg.levels)
        return cls(
            model=UNet(cfg=model_cfg),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            cfg=infer_cfg or InferConfig(),
            mesh=mesh,
        )

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        model_cfg: Optional[ModelConfig] = None,
        infer_cfg: Optional[InferConfig] = None,
        epoch: Optional[int] = None,
        mesh: Optional[MeshSpec] = None,
        ema: bool = False,
    ) -> "Predictor":
        from unetseg_tpu.train.checkpoint import restore_params_for_inference
        from unetseg_tpu.train.state import create_train_state

        model_cfg = model_cfg or ModelConfig()
        model = UNet(cfg=model_cfg)
        template = create_train_state(
            jax.random.key(0), model_cfg=model_cfg,
            input_size=(infer_cfg or InferConfig()).image_size, model=model,
        )
        params, batch_stats = restore_params_for_inference(
            checkpoint_dir, template, epoch=epoch, ema=ema
        )
        return cls(
            model=model, params=params, batch_stats=batch_stats,
            cfg=infer_cfg or InferConfig(), mesh=mesh,
        )

    @classmethod
    def from_checkpoints(
        cls,
        checkpoint_dirs: List[str],
        model_cfg: Optional[ModelConfig] = None,
        infer_cfg: Optional[InferConfig] = None,
        mesh: Optional[MeshSpec] = None,
        ema: Any = False,
    ) -> "Predictor":
        """Deep-ensemble predictor over several trained checkpoints (e.g.
        the per-seed best checkpoints of a multi-seed recipe run): member
        probabilities are averaged on device. The reference has no ensemble
        story; this is the natural use for the seeds its training script
        varies implicitly (reference: scripts/train.py:34 shuffle).

        ema: False = raw weights, True = each member's EMA shadow,
        "both" = TWO members per checkpoint (raw + EMA) — 2k-member
        diversity from a k-seed training run."""
        both = ema == "both"
        if len(checkpoint_dirs) == 1 and not both:
            return cls.from_checkpoint(
                checkpoint_dirs[0], model_cfg=model_cfg,
                infer_cfg=infer_cfg, mesh=mesh, ema=bool(ema),
            )
        from unetseg_tpu.train.checkpoint import restore_params_for_inference
        from unetseg_tpu.train.state import create_train_state

        model_cfg = model_cfg or ModelConfig()
        model = UNet(cfg=model_cfg)
        template = create_train_state(
            jax.random.key(0), model_cfg=model_cfg,
            input_size=(infer_cfg or InferConfig()).image_size, model=model,
        )
        params, stats = [], []
        for d in checkpoint_dirs:
            for use in ((False, True) if both else (bool(ema),)):
                p, bs = restore_params_for_inference(d, template, ema=use)
                params.append(p)
                stats.append(bs)
        return cls(
            model=model, params=params, batch_stats=stats,
            cfg=infer_cfg or InferConfig(), mesh=mesh,
        )
