"""Typed configuration for the whole framework.

The reference keeps configuration as module-level constants scattered across
scripts (reference: scripts/train.py:22-36, scripts/track.py:8-24,
scripts/predict.py:28-54, scripts/preprocess_data.py:14-15; its config.py is an
empty stub). Here a single tree of frozen dataclasses carries every knob, with
defaults that mirror the reference values exactly, and every CLI entry point
maps flags onto this tree.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class ModelConfig:
    """U-Net architecture (reference: models/unet_model.py:65-85)."""

    in_channels: int = 1
    # The reference trains with n_classes=2 + softmax CE (scripts/train.py:93)
    # but some of its scripts build n_classes=1 + sigmoid — a documented defect
    # (SURVEY.md §2). We standardise on 2 everywhere; 1 remains supported.
    num_classes: int = 2
    base_features: int = 64          # channels double each level: 64..1024
    levels: int = 5                  # encoder depth incl. bottleneck
    bilinear: bool = False           # False => transposed-conv up path (reference default)
    # Numerics policy: params are always fp32; compute dtype is configurable.
    compute_dtype: str = "bfloat16"  # "bfloat16" | "float32"
    bn_momentum: float = 0.9         # flax convention; == torch momentum 0.1
    bn_epsilon: float = 1e-5


@dataclass(frozen=True)
class DataConfig:
    """Dataset layout & augmentation (reference: utils/dataset.py,
    utils/augmentations.py, scripts/preprocess_data.py)."""

    data_root: str = "./data/raw/train/DIC-C2DH-HeLa"
    sequence: str = "01"
    val_percent: float = 0.1
    augment: bool = True
    elastic_alpha: float = 2000.0    # scripts/train.py:35
    elastic_sigma: float = 20.0      # scripts/train.py:36
    # Weight-map parameters (scripts/preprocess_data.py:14-15)
    w0: float = 10.0
    sigma_w: float = 5.0
    image_size: int = 512            # training / predict resize target
    # Per-frame z-score standardization (absent from the reference, whose
    # two sequences differ in illumination; see docs/ROADMAP.md item 1).
    # Applied on device inside the train/eval steps, AFTER photometric
    # augmentation (z-scoring first would make gamma ill-defined).
    standardize: bool = False
    # Photometric augmentation (ops/intensity.py; extension over the
    # reference's elastic-only augmentation — 0.0 disables each stage).
    aug_gamma: float = 0.0           # log-range of per-item random gamma
    aug_illum: float = 0.0           # low-freq multiplicative illumination
    aug_noise: float = 0.0           # max additive Gaussian noise std


@dataclass(frozen=True)
class TrainConfig:
    """Training loop (reference: scripts/train.py:22-36,97)."""

    batch_size: int = 4
    num_epochs: int = 20
    learning_rate: float = 1e-4
    momentum: float = 0.99
    optimizer: str = "sgd"           # "sgd" (reference) | "adam" | "adamw"
    weight_decay: float = 0.0        # adamw only
    cosine_decay: bool = False       # cosine lr schedule over num_epochs
    checkpoint_dir: str = "./checkpoints"
    save_checkpoint: bool = True
    keep_best_k: int = 3
    # minimum epochs between best-val saves (device->host of the 372 MB
    # train state is expensive on slow links; the final epoch always saves
    # if it improved)
    checkpoint_min_interval: int = 1
    # Checkpoint saves drain on a background writer thread from
    # donation-safe device copies (train/checkpoint.Checkpointer): the
    # 30-47 s synchronous fetch of the full state through the remote
    # tunnel leaves the training critical path. False restores inline
    # synchronous writes.
    async_save: bool = True
    # epochs between full (resumable fp32+optimizer) saves; best-val saves
    # in between write only the ~6x-smaller bf16 inference shadow. The last
    # epoch always writes a full save.
    full_save_interval: int = 5
    seed: int = 0
    log_every: int = 10              # steps between metric log lines (each
                                     # log point syncs a device scalar)
    metrics_jsonl: Optional[str] = None  # optional metrics JSONL path
    resume: bool = False             # resume from latest checkpoint if present
    donate_state: bool = True        # donate train-state buffers to the step
    profile_dir: Optional[str] = None  # jax.profiler trace of early steps
    profile_steps: int = 5           # how many steps the trace covers
    border_boost: float = 5.0        # 3-class mode: loss multiplier on the
                                     # (rare) border class
    # jax.checkpoint policy for the forward ("dots" | "dots_no_batch" |
    # "nothing" | None). "dots" keeps conv outputs and recomputes the
    # elementwise BN/ReLU chains in the backward pass: measured 66.6 -> 61.5
    # ms/step (identical numerics); the aggressive policies lose (88 ms).
    # Ignored (treated as None) when the lanes train path is active — remat
    # slows the lanes step (52.4 vs 46.2 ms no-aug).
    remat: Optional[str] = "dots"
    # Lanes-native train forward (models/lanes_train.py): enc0 + up3/dec3 as
    # Pallas custom-VJP kernels. "auto" uses it on a single TPU chip when
    # the geometry supports it (infer/lanes_net.supports); "on"/"off" force.
    # Measured 61.5 -> 46.2 ms/step no-aug at batch 4, 512^2; numerics match
    # the Flax step to 1.2e-5 after one SGD update (tools/
    # lanes_train_parity_native.py on the chip).
    lanes: str = "auto"
    # Exponential moving average of params + BN stats (0 disables). The
    # shadow updates after every optimizer step with the debiased schedule
    # d_t = min(ema_decay, (1+t)/(10+t)) (the classic tf.train
    # ExponentialMovingAverage num_updates rule), so short runs are not
    # stuck near the init. Saved alongside the raw weights in both
    # checkpoint streams; evaluate with `predict --ema`. Motivation: the
    # recipe's seq-02 SEG spreads +-0.03 across seeds (docs/RESULTS.md) —
    # weight averaging is the standard variance reducer.
    ema_decay: float = 0.0
    # Device-resident data feed: put the whole dataset in HBM once and
    # lax.scan the step over each epoch's index matrix (ONE dispatch per
    # epoch, no per-step host->device batch transfer — the remote-tunnel
    # host feed measured 0.5-0.6 steps/s wall against a ~20 steps/s device
    # program). Falls back to the host-fed per-step loop under a mesh, when
    # profiling (profile_dir), or with max_steps. Per-step RNG is
    # fold_in(epoch_key, global_step) in this mode, so fixed-seed runs are
    # not bit-identical to the host-fed loop (batch composition IS).
    device_data: bool = True


@dataclass(frozen=True)
class InferConfig:
    """Inference (reference: scripts/inference.py, scripts/predict.py; plus the
    overlap-tile engine the reference only advertises)."""

    image_size: int = 512
    threshold: float = 0.5
    normalize_mean: float = 0.5      # scripts/predict.py:53
    normalize_std: float = 0.5
    # The reference TRAINS on ToTensor [0,1] inputs but predict.py applies
    # Normalize(0.5, 0.5) at inference — a train/infer skew (its inference.py
    # does not normalize). We default to the training distribution;
    # normalize=True reproduces predict.py's behavior.
    normalize: bool = False
    # Per-frame z-score at inference; must match DataConfig.standardize used
    # in training.
    standardize: bool = False
    min_cell_size: int = 15          # scripts/predict.py:47
    tile_input: int = 512            # overlap-tile input tile size
    tile_batch: int = 8              # tiles per device batch
    # Temporal-marker watershed for predict (post/temporal.py): re-seed the
    # watershed from the previous frame's instance cores where the distance
    # transform under-segments. The measured-best instance pipeline
    # (docs/RESULTS.md round 2); off here for reference-parity defaults,
    # on in configs/best_recipe.json.
    temporal_markers: bool = False
    # Fragment guard for the temporal re-split (post/temporal.py): drop a
    # re-seeded sub-instance below this fraction of its seeding previous
    # instance's area and re-flood with the surviving seeds. 0 disables.
    temporal_area_guard: float = 0.3
    # Backward temporal sweep (post/temporal.refine_backward): after the
    # forward pass, propagate later frames' instance boundaries BACKWARD so
    # early frames — which have no history — get their touching cells split
    # too. Adoption is strictly more-pieces-only (splits propagate, merges
    # never do). Requires temporal_markers.
    temporal_bidi: bool = False
    # sweep depth from the sequence start (post/temporal.refine_backward
    # max_frames): whole-sequence sweeps pre-split dividing parents — a
    # measured negative (docs/RESULTS.md round 7)
    temporal_bidi_frames: int = 8
    # test-time augmentation for tiled binary prediction: "none" | "flips"
    # (the 4 axis-flip transforms) | "flips8" (the full D4 group: 4 flips x
    # transpose, square frames only — best measured TRA/DET at a small SEG
    # cost, docs/RESULTS.md round 7). Probabilities combine per tta_merge
    # before thresholding (infer/tiling.TTA_TRANSFORMS). 4x/8x device
    # compute; the reference has no equivalent. Validated when the
    # Predictor is constructed.
    tta: str = "none"
    # how TTA probabilities merge (infer/tiling.py): "mean" (arithmetic —
    # smooths cell-cell boundaries), "gmean" (geometric — a near-zero
    # boundary probability under any flip keeps the pixel background, so
    # separating membranes survive), "vote" (per-flip threshold then strict
    # pixel majority, >half the flips), "max" (union — recall-maximizing).
    tta_merge: str = "mean"
    # load the EMA weight shadow instead of the raw weights (requires
    # checkpoints trained with TrainConfig.ema_decay > 0). CLI --ema also
    # turns this on per invocation. Measured round 8: per-seed SEG means
    # up ~+0.013 on both sequences and the seq-02 seed spread collapses
    # ~6x (docs/RESULTS.md round-8 table).
    use_ema: bool = False
    # grow every predicted instance up to this many px into BACKGROUND at
    # write time (post/boundary.grow_instances): nearest-label assignment,
    # labels never overwrite labels, so touching-cell membranes stay put.
    # Recovers the boundary ring the vote merges erode — measured round 5:
    # seq-01 grow 1.0 TRA +0.0039/DET +0.0039 (SEG +0.0002), seq-02 grow
    # 1.5 SEG +0.0067/TRA +0.0063/DET +0.0069, divisions intact. 0 = off.
    # The optimum is sequence-dependent; best_recipe.json ships 1.0 plus a
    # per-sequence override (Config.infer_per_sequence) of 1.5 for seq 02.
    boundary_grow: float = 0.0
    # how deep-ensemble MEMBER probabilities merge (infer/engine.py):
    # "mean" | "gmean" | "vote" — same trade-offs as tta_merge (member
    # disagreement concentrates on the membranes between touching cells).
    # Binary head only; 3-class ensembles always mean.
    ensemble_merge: str = "mean"


@dataclass(frozen=True)
class TrackConfig:
    """Tracker thresholds (reference: scripts/track.py:21-24)."""

    iou_threshold_track: float = 0.3
    iou_threshold_division: float = 0.1
    max_children: int = 2
    # Improved division detection (on by default; faithful mode and
    # division_from_matched=False give reference semantics): a dividing
    # cell's larger daughter usually wins the 1-to-1 match (IoU ~0.3-0.5),
    # so the reference's unmatched-parent rule misses most divisions. With
    # this on, a matched pair whose parent also overlaps an unmatched
    # object at the division threshold — and whose match IoU is at most
    # `matched_division_iou_cap` (a true division roughly halves IoU) — is
    # reinterpreted as a division.
    division_from_matched: bool = True
    matched_division_iou_cap: float = 0.6
    # Area gate on division candidates (both detection paths, non-faithful
    # modes only; 0 disables): every daughter must be at least this fraction
    # of the parent's area. Real HeLa daughters are ~half the parent;
    # watershed fragments are far smaller — the gate removes the
    # fragment-triggered false divisions that made division_from_matched
    # over-trigger (76 children on seq 01 in round 1).
    division_min_child_frac: float = 0.25
    # Asymmetric division-candidate test (non-faithful modes; 0 disables):
    # accept an unmatched current object as a daughter when
    # intersection(parent, object) / area(object) >= this, even if its IoU
    # vs the parent is below iou_threshold_division. IoU is structurally
    # depressed for daughters (~half the parent's size: a fully-contained
    # daughter caps at IoU ~0.5, and offset ones fall fast) — the one
    # missed seq-01 division had daughter-coverage 0.26 at IoU 0.074
    # (tools/division_debug.py).
    division_child_cover: float = 0.25


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation (reference: scripts/evaluate.py, utils/metrics.py,
    EvaluationSoftware/)."""

    threshold: float = 0.5
    penalize_extra_detections: bool = True  # DET FP weight on/off


@dataclass(frozen=True)
class MeshConfig:
    """Named device mesh. The reference has no distributed code at all
    (SURVEY.md §2 'Parallelism inventory'); this is the TPU-native equivalent:
    batch-axis data parallelism and tile-axis sharding over ICI."""

    data_axis: str = "data"
    tile_axis: str = "tile"
    model_axis: str = "model"
    # -1 => use all available devices on that axis
    data_parallel: int = -1
    tile_parallel: int = 1
    model_parallel: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    track: TrackConfig = field(default_factory=TrackConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # per-sequence InferConfig field overrides, e.g.
    # {"02": {"boundary_grow": 1.5}} — applied by the pipeline driver when
    # it evaluates each sequence (cli/main.cmd_pipeline). Sequence-tuned
    # inference settings are standard CTC practice; this keeps them in the
    # shipped recipe instead of ad-hoc flags.
    infer_per_sequence: dict = field(default_factory=dict)

    # ------------------------------------------------------------------ utils
    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(tp, sub):
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kw = {}
            for k, v in sub.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {tp.__name__}.{k}")
                ft = fields[k].type
                if isinstance(v, dict) and k in _SECTION_TYPES:
                    kw[k] = build(_SECTION_TYPES[k], v)
                else:
                    kw[k] = v
            return tp(**kw)

        return build(cls, d)

    @classmethod
    def from_json_file(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))


_SECTION_TYPES = {
    "model": ModelConfig,
    "data": DataConfig,
    "train": TrainConfig,
    "infer": InferConfig,
    "track": TrackConfig,
    "eval": EvalConfig,
    "mesh": MeshConfig,
}
