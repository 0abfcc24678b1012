from anatomask_tpu.ssl.sparse import (
    upsample_mask,
    mask_to_resolution,
    SparseInstanceNorm,
    SparseBatchNorm,
    SparseGroupNorm,
    SparseLayerNorm,
    SparseBasicResBlock,
    SparseSTUNetEncoder,
)
from anatomask_tpu.ssl.decoder import LightDecoder, UNetBlock
from anatomask_tpu.ssl.spark import SparK, patchify, unpatchify, spark_loss
from anatomask_tpu.ssl.anatomask import generate_guided_mask, random_mask
from anatomask_tpu.ssl.ema import ema_update, ema_decay_schedule
