"""Learning-signal smoke tests: the full stack (sampler -> on-device augment ->
loss -> optimizer) must actually LEARN an easy synthetic task, and pretraining
must reduce reconstruction loss. Guards against silent wiring bugs that shape
tests can't catch."""
import os

import numpy as np
import pytest

from synthetic import make_synthetic_dataset, setup_env


def test_supervised_training_learns(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset940_Conv", num_cases=6, shape=(22, 24, 26),
                           num_labels=1)
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from anatomask_tpu.plans.plans_handler import load_json, save_json
    DatasetFingerprintExtractor("Dataset940_Conv", num_processes=1).run()
    ExperimentPlanner("Dataset940_Conv").plan_experiment()
    DefaultPreprocessor().run("Dataset940_Conv", "3d_fullres", "ATKPlans", num_processes=1)

    plans_file = os.path.join(pp, "Dataset940_Conv", "ATKPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["tiny"] = {
        "inherits_from": "3d_fullres",
        "data_identifier": plans["configurations"]["3d_fullres"]["data_identifier"],
        "patch_size": [16, 16, 16], "batch_size": 4,
        "UNet_base_num_features": 8, "unet_max_num_features": 16,
        "pool_op_kernel_sizes": [[1, 1, 1], [2, 2, 2]],
        "conv_kernel_sizes": [[3, 3, 3]] * 2,
        "n_conv_per_stage_encoder": [2, 2], "n_conv_per_stage_decoder": [2],
        "num_pool_per_axis": [1, 1, 1], "batch_dice": True,
    }
    save_json(plans, plans_file, sort_keys=False)

    from anatomask_tpu.training.trainer import Trainer, TrainerConfig
    cfg = TrainerConfig(
        name="ATKTrainerConvT", num_epochs=2, num_iterations_per_epoch=20,
        num_val_iterations_per_epoch=5, compute_dtype="float32", num_workers=1,
        initial_lr=1e-2, do_data_augmentation=False,  # isolate the learning signal
    )
    dataset_json = load_json(os.path.join(pp, "Dataset940_Conv", "dataset.json"))
    t = Trainer(plans_file, "tiny", 0, dataset_json, cfg)
    t.run_training()
    lg = t.logger.logging
    # loss must drop substantially and pseudo-Dice must become meaningful
    assert lg["train_losses"][-1] < lg["train_losses"][0] - 0.05, lg["train_losses"]
    assert lg["mean_fg_dice"][-1] > 0.1, lg["mean_fg_dice"]


def test_pretraining_reduces_reconstruction_loss(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset941_Conv", num_cases=6, shape=(20, 22, 24))
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    DatasetFingerprintExtractor("Dataset941_Conv", num_processes=1).run()
    ExperimentPlanner("Dataset941_Conv").plan_experiment()
    DefaultPreprocessor().run("Dataset941_Conv", "3d_fullres", "ATKPlans", num_processes=1)

    from anatomask_tpu.ssl.pretrain import PretrainConfig, PretrainTrainer
    cfg = PretrainConfig(
        method="anatomask", model_size="S", patch_size=(16, 16, 16), batch_size=4,
        num_epochs=3, iters_per_epoch=12, compute_dtype="float32",
        encoder_dims=(8, 16, 16), encoder_depth=(1, 1, 1), decoder_width=16,
        num_workers=1, warmup_epochs=1, lr=3e-3,
    )
    t = PretrainTrainer("Dataset941_Conv", cfg)
    history = t.run_pretraining()
    assert history["train_loss"][-1] < history["train_loss"][0] * 0.95, history["train_loss"]
