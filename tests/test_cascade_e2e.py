"""Cascade (3d_lowres -> 3d_cascade_fullres) end-to-end: train lowres, export
next-stage predictions, train the cascade stage with the previous-stage one-hot
stacked into the input (reference nnUNetTrainer cascade path :1190-1220 +
determine_num_input_channels)."""
import os

import numpy as np
import pytest

from synthetic import make_synthetic_dataset, setup_env


def test_cascade_training(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset911_Casc", num_cases=5, shape=(18, 20, 22))
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from anatomask_tpu.plans.plans_handler import load_json, save_json

    DatasetFingerprintExtractor("Dataset911_Casc", num_processes=1).run()
    ExperimentPlanner("Dataset911_Casc").plan_experiment()
    DefaultPreprocessor().run("Dataset911_Casc", "3d_fullres", "ATKPlans", num_processes=1)

    plans_file = os.path.join(pp, "Dataset911_Casc", "ATKPlans.json")
    plans = load_json(plans_file)
    fullres_ident = plans["configurations"]["3d_fullres"]["data_identifier"]
    tiny = {
        "inherits_from": "3d_fullres",
        "data_identifier": fullres_ident,
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
    plans["configurations"]["tiny_lowres"] = dict(tiny, next_stage="tiny_cascade")
    plans["configurations"]["tiny_cascade"] = dict(tiny, previous_stage="tiny_lowres")
    save_json(plans, plans_file, sort_keys=False)
    dataset_json = load_json(os.path.join(pp, "Dataset911_Casc", "dataset.json"))

    from anatomask_tpu.training.trainer import Trainer, TrainerConfig
    cfg = TrainerConfig(name="ATKTrainerCascT", num_epochs=1, num_iterations_per_epoch=2,
                        num_val_iterations_per_epoch=1, compute_dtype="float32",
                        num_workers=1)

    # stage 1: lowres; validation also exports next-stage predictions
    t1 = Trainer(plans_file, "tiny_lowres", 0, dataset_json, cfg)
    t1.run_training()
    t1.perform_actual_validation()
    next_stage_dir = os.path.join(t1.output_folder_base, "predicted_next_stage", "tiny_cascade")
    assert os.path.isdir(next_stage_dir)
    exported = [f for f in os.listdir(next_stage_dir) if f.endswith(".npz")]
    assert len(exported) == len(t1.do_split()[1])

    # stage 2: cascade consumes the previous stage (validation cases only have
    # exports, so restrict training to those for the test)
    from anatomask_tpu.plans.label_handling import determine_num_input_channels
    pm = t1.plans_manager
    n_in = determine_num_input_channels(pm, pm.get_configuration("tiny_cascade"), dataset_json)
    assert n_in == 1 + len(t1.label_manager.foreground_labels)

    from anatomask_tpu.data.dataset import CaseDataset
    keys = sorted(f[:-4] for f in exported)
    ds = CaseDataset(t1.preprocessed_dataset_folder, keys,
                     folder_with_segs_from_previous_stage=next_stage_dir)
    data, seg, props = ds.load_case(keys[0])
    assert seg.shape[0] == 2  # gt seg + previous-stage seg stacked

    # fabricate exports for the remaining cases (real usage trains all 5
    # lowres folds so every case has one) and TRAIN the cascade stage:
    # sampler corruption + on-device one-hot stacking + widened input
    all_keys = sorted(CaseDataset(t1.preprocessed_dataset_folder).keys())
    for k in all_keys:
        out = os.path.join(next_stage_dir, k + ".npz")
        if not os.path.isfile(out):
            with np.load(os.path.join(t1.preprocessed_dataset_folder, k + ".npz")) as z:
                np.savez_compressed(out, seg=z["seg"][0])

    t2 = Trainer(plans_file, "tiny_cascade", 0, dataset_json, cfg)
    t2.run_training()
    assert np.isfinite(t2.logger.logging["train_losses"][0])
    # the cascade network consumed modalities + one-hot channels
    first_kernel = t2.params["encoder_stage_0"]["conv0"]["conv"]["conv"]["kernel"]
    assert first_kernel.shape[3] == n_in
