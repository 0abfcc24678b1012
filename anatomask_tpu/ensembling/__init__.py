from anatomask_tpu.ensembling.ensemble import (
    average_probabilities,
    ensemble_folders,
    ensemble_crossvalidations,
)
