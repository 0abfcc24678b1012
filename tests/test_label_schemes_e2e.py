"""Label-scheme matrix e2e (reference integration tests cover standard labels,
ignore label, regions, regions+ignore — Dataset996-999). The standard path is
covered by test_trainer_e2e; here we train tiny models on the regions and
ignore variants to exercise the DC+BCE/region and masked-loss paths."""
import os

import numpy as np
import pytest

from synthetic import setup_env


def _prepare(tmp_path, scheme, dataset_id):
    raw, pp, res = setup_env(tmp_path)
    from anatomask_tpu.dataset_conversion.integration_test_datasets import (
        generate_integration_test_dataset,
    )
    ds_dir = generate_integration_test_dataset(dataset_id, scheme, num_cases=4,
                                               shape=(18, 20, 22))
    name = os.path.basename(ds_dir)
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from anatomask_tpu.plans.plans_handler import load_json, save_json

    DatasetFingerprintExtractor(name, num_processes=1).run()
    ExperimentPlanner(name).plan_experiment()
    DefaultPreprocessor().run(name, "3d_fullres", "ATKPlans", num_processes=1)

    plans_file = os.path.join(pp, name, "ATKPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["tiny"] = {
        "inherits_from": "3d_fullres",
        "data_identifier": plans["configurations"]["3d_fullres"]["data_identifier"],
        "patch_size": [16, 16, 16],
        "batch_size": 2,
        "UNet_base_num_features": 2,
        "unet_max_num_features": 4,
        "pool_op_kernel_sizes": [[1, 1, 1], [2, 2, 2]],
        "conv_kernel_sizes": [[3, 3, 3]] * 2,
        "n_conv_per_stage_encoder": [1, 1],
        "n_conv_per_stage_decoder": [1],
        "num_pool_per_axis": [1, 1, 1],
        "batch_dice": True,
    }
    save_json(plans, plans_file, sort_keys=False)
    dataset_json = load_json(os.path.join(pp, name, "dataset.json"))
    return plans_file, dataset_json


def _train(plans_file, dataset_json):
    from anatomask_tpu.training.trainer import Trainer, TrainerConfig
    cfg = TrainerConfig(
        name="ATKTrainerTiny", num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=2, compute_dtype="float32", num_workers=1,
    )
    t = Trainer(plans_file, "tiny", 0, dataset_json, cfg)
    t.run_training()
    return t


def test_regions_training(tmp_path):
    plans_file, dataset_json = _prepare(tmp_path, "regions", 977)
    t = _train(plans_file, dataset_json)
    assert t.label_manager.has_regions
    assert t.label_manager.num_segmentation_heads == 2
    lg = t.logger.logging
    assert np.isfinite(lg["train_losses"][0])
    # final validation writes region-thresholded segmentations
    metrics = t.perform_actual_validation()
    assert "Dice" in metrics["foreground_mean"]


def test_ignore_label_training(tmp_path):
    plans_file, dataset_json = _prepare(tmp_path, "ignore", 978)
    t = _train(plans_file, dataset_json)
    assert t.label_manager.has_ignore_label
    lg = t.logger.logging
    assert np.isfinite(lg["train_losses"][0])
    metrics = t.perform_actual_validation()
    assert "Dice" in metrics["foreground_mean"]


def test_regions_ignore_training(tmp_path):
    plans_file, dataset_json = _prepare(tmp_path, "regions_ignore", 979)
    t = _train(plans_file, dataset_json)
    assert t.label_manager.has_regions and t.label_manager.has_ignore_label
    assert np.isfinite(t.logger.logging["train_losses"][0])
