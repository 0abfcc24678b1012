from anatomask_tpu.models.stunet import STUNet, STUNetEncoder, stunet_preset
from anatomask_tpu.models.plain_unet import PlainConvUNet
from anatomask_tpu.models.build import build_network_from_plans
