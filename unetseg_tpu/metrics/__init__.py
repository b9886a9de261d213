from unetseg_tpu.metrics.binary import batch_mean_iou, dice, iou  # noqa: F401
from unetseg_tpu.metrics.rand import rand_index_and_error  # noqa: F401
from unetseg_tpu.metrics import ctc  # noqa: F401
