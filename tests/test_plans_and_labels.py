import numpy as np
import pytest

from anatomask_tpu.plans.label_handling import (
    LabelManager,
    convert_labelmap_to_one_hot,
    determine_num_input_channels,
)
from anatomask_tpu.plans.plans_handler import PlansManager


def _mini_plans():
    return {
        "dataset_name": "Dataset999_Test",
        "plans_name": "ATKPlans",
        "original_median_spacing_after_transp": [1.0, 1.0, 1.0],
        "original_median_shape_after_transp": [64, 64, 64],
        "image_reader_writer": "NiftiIO",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "experiment_planner_used": "ExperimentPlanner",
        "foreground_intensity_properties_per_channel": {"0": {"mean": 0, "std": 1}},
        "configurations": {
            "3d_fullres": {
                "data_identifier": "ATKPlans_3d_fullres",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": 2,
                "patch_size": [64, 64, 64],
                "median_image_size_in_voxels": [64, 64, 64],
                "spacing": [1.0, 1.0, 1.0],
                "normalization_schemes": ["ZScoreNormalization"],
                "use_mask_for_norm": [False],
                "UNet_class_name": "PlainConvUNet",
                "UNet_base_num_features": 32,
                "n_conv_per_stage_encoder": [2, 2, 2, 2],
                "n_conv_per_stage_decoder": [2, 2, 2],
                "num_pool_per_axis": [3, 3, 3],
                "pool_op_kernel_sizes": [[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
                "conv_kernel_sizes": [[3, 3, 3]] * 4,
                "unet_max_num_features": 320,
                "resampling_fn_data": "resample_data_or_seg_to_shape",
                "resampling_fn_data_kwargs": {"is_seg": False, "order": 3, "order_z": 0, "force_separate_z": None},
                "resampling_fn_seg": "resample_data_or_seg_to_shape",
                "resampling_fn_seg_kwargs": {"is_seg": True, "order": 1, "order_z": 0, "force_separate_z": None},
                "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
                "resampling_fn_probabilities_kwargs": {"is_seg": False, "order": 1, "order_z": 0, "force_separate_z": None},
                "batch_dice": True,
            },
            "3d_bs4": {"inherits_from": "3d_fullres", "batch_size": 4},
        },
    }


def test_plans_inheritance():
    pm = PlansManager(_mini_plans())
    cm = pm.get_configuration("3d_bs4")
    assert cm.batch_size == 4
    assert cm.patch_size == [64, 64, 64]  # inherited
    assert pm.available_configurations == ["3d_fullres", "3d_bs4"]


def test_plans_circular_inheritance_detected():
    plans = _mini_plans()
    plans["configurations"]["a"] = {"inherits_from": "b"}
    plans["configurations"]["b"] = {"inherits_from": "a"}
    pm = PlansManager(plans)
    with pytest.raises(RuntimeError, match="[Cc]ircular"):
        pm.get_configuration("a")


def test_label_manager_plain():
    lm = LabelManager({"background": 0, "spleen": 1, "liver": 2}, None)
    assert not lm.has_regions
    assert lm.all_labels == [0, 1, 2]
    assert lm.foreground_labels == [1, 2]
    assert lm.num_segmentation_heads == 3
    logits = np.zeros((3, 2, 2, 2), dtype=np.float32)
    logits[1] = 5.0
    assert (lm.convert_logits_to_segmentation(logits) == 1).all()


def test_label_manager_regions():
    lm = LabelManager(
        {"background": 0, "whole": (1, 2, 3), "core": (2, 3), "enhancing": 3},
        regions_class_order=[1, 2, 3],
    )
    assert lm.has_regions
    assert lm.num_segmentation_heads == 3
    probs = np.zeros((3, 2, 2, 2), dtype=np.float32)
    probs[0] = 0.9  # whole tumor everywhere
    probs[1, 0] = 0.8  # core in first x-slab
    seg = lm.convert_probabilities_to_segmentation(probs)
    assert seg[1, 0, 0] == 1
    assert seg[0, 0, 0] == 2


def test_label_manager_ignore():
    lm = LabelManager({"background": 0, "fg": 1, "ignore": 2}, None)
    assert lm.has_ignore_label and lm.ignore_label == 2
    with pytest.raises(AssertionError):
        LabelManager({"background": 0, "fg": 5, "ignore": 2}, None)


def test_revert_cropping():
    lm = LabelManager({"background": 0, "fg": 1}, None)
    probs = np.full((2, 2, 2, 2), 0.5, dtype=np.float32)
    out = lm.revert_cropping_on_probabilities(probs, [[1, 3], [0, 2], [2, 4]], (4, 4, 4))
    assert out.shape == (2, 4, 4, 4)
    assert out[0, 0, 0, 0] == 1.0  # background prob 1 in padding
    assert out[0, 1, 0, 2] == 0.5


def test_one_hot():
    seg = np.array([[[0, 1], [2, 1]]])
    oh = convert_labelmap_to_one_hot(seg, [0, 1, 2])
    assert oh.shape == (3, 1, 2, 2)
    np.testing.assert_array_equal(oh.sum(0), 1)


def test_determine_num_input_channels():
    pm = PlansManager(_mini_plans())
    ds = {"channel_names": {"0": "CT"}, "labels": {"background": 0, "fg": 1}}
    assert determine_num_input_channels(pm, "3d_fullres", ds) == 1
    # cascade: previous stage adds one-hot foreground channels
    plans = _mini_plans()
    plans["configurations"]["cascade"] = {
        "inherits_from": "3d_fullres", "previous_stage": "3d_lowres",
    }
    assert determine_num_input_channels(PlansManager(plans), "cascade", ds) == 2
