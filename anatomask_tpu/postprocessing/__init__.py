from anatomask_tpu.postprocessing.components import (
    remove_all_but_largest_component_from_segmentation,
    determine_postprocessing,
    apply_postprocessing,
    apply_postprocessing_to_folder,
)
