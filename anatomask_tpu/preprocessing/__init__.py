from anatomask_tpu.preprocessing.cropping import crop_to_nonzero, create_nonzero_mask
from anatomask_tpu.preprocessing.normalization import get_normalization_scheme
from anatomask_tpu.preprocessing.resampling import (
    compute_new_shape,
    resample_data_or_seg_to_shape,
    get_resampling_fn,
)
from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
