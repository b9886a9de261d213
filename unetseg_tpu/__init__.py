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

# numpy madvises MADV_HUGEPAGE on large buffers; with the host kernel in
# THP defrag=madvise mode every first-touch write fault then does
# synchronous hugepage compaction — measured 5 MB/s (np.stack of 84 512^2
# frames: 16.8 s vs 0.06 s with this off, a ~300x difference that made
# dataset loading dominate training startup). The env knob
# (NUMPY_MADVISE_HUGEPAGE=0) only works before numpy's first import, and
# this environment pre-imports numpy from sitecustomize, so flip the
# policy through numpy's runtime switch as well.
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:  # numpy >= 2
    from numpy._core import _multiarray_umath as _mu
except ImportError:  # pragma: no cover - numpy 1.x
    try:
        from numpy.core import _multiarray_umath as _mu
    except ImportError:  # pragma: no cover
        _mu = None
if _mu is not None and hasattr(_mu, "_set_madvise_hugepage"):
    _mu._set_madvise_hugepage(False)

from unetseg_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    InferConfig,
    ModelConfig,
    TrackConfig,
    TrainConfig,
)
