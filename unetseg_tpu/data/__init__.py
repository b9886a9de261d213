from unetseg_tpu.data.dataset import Batch, HeLaArrays, iter_batches, train_val_split  # noqa: F401
from unetseg_tpu.data.io import SequencePaths, read_image, write_mask_u16, write_mask_u8  # noqa: F401
