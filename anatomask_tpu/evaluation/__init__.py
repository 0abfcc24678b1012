from anatomask_tpu.evaluation.metrics import (
    compute_metrics,
    compute_metrics_on_folder,
    label_or_region_to_mask,
)
