from anatomask_tpu.plans.plans_handler import PlansManager, ConfigurationManager
from anatomask_tpu.plans.label_handling import (
    LabelManager,
    convert_labelmap_to_one_hot,
    determine_num_input_channels,
)
