from unetseg_tpu.models.unet import UNet, create_unet, init_unet, param_count  # noqa: F401
from unetseg_tpu.models import shapes  # noqa: F401
