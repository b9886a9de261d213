from unetseg_tpu.infer.engine import Predictor, load_image_01  # noqa: F401
from unetseg_tpu.infer.tiling import TileGrid, make_tiled_fn, plan_tiles, tiled_apply  # noqa: F401
from unetseg_tpu.infer.folding import FoldedUNet, fold_batchnorm  # noqa: F401
