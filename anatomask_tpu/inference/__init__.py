from anatomask_tpu.inference.gaussian import compute_gaussian
from anatomask_tpu.inference.sliding_window import (
    compute_steps_for_sliding_window,
    pad_nd_image,
    sliding_window_predict,
)
from anatomask_tpu.inference.predictor import Predictor
