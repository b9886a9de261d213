"""unetseg_tpu — TPU-native U-Net cell segmentation & tracking framework.

A brand-new JAX / Flax / Pallas / pjit framework with the capabilities of the
reference PyTorch project SaurabhIndi/unet-segmentation (see SURVEY.md):

- Original valid-convolution U-Net (Ronneberger et al.) for binary HeLa-cell
  segmentation (reference: models/unet_model.py).
- EDT-based pixel weight maps (reference: scripts/preprocess_data.py).
- On-device elastic-deformation augmentation (reference: utils/augmentations.py).
- Weighted softmax cross-entropy training, SGD momentum 0.99
  (reference: utils/losses.py, scripts/train.py).
- Single-image, sequence, and overlap-tile inference with mesh-sharded tiles
  (reference: scripts/inference.py, scripts/predict.py; the overlap-tile engine
  the reference README advertises but never implemented).
- Connected-component instance extraction (reference: utils/metrics.py:42).
- IoU/Hungarian tracking with division detection, CTC res_track.txt output
  (reference: scripts/track.py).
- IoU / Dice / Rand metrics and native C++ CTC SEG/TRA/DET measures validated
  against the golden values in EvaluationSoftware/testing_dataset.

Everything on the compute path is NHWC, jit/pjit-compiled, bf16-by-policy with
fp32 parameters and accumulation, and designed for `jax.sharding.Mesh` named
axes ('data', 'tile', 'model').
"""

__version__ = "0.1.0"

from unetseg_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    InferConfig,
    ModelConfig,
    TrackConfig,
    TrainConfig,
)
