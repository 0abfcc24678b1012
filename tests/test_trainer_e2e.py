"""End-to-end: synthetic dataset -> fingerprint -> plan -> preprocess -> train
(tiny net, 2 epochs) -> checkpoint/resume -> final validation -> metrics.
Mirrors the reference's integration-test philosophy (SURVEY.md §4) but actually
asserts outcomes."""
import os

import numpy as np
import pytest

from synthetic import make_synthetic_dataset, setup_env


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset903_E2E", num_cases=6, shape=(22, 24, 26))

    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from anatomask_tpu.plans.plans_handler import load_json, save_json

    DatasetFingerprintExtractor("Dataset903_E2E", num_processes=1).run()
    ExperimentPlanner("Dataset903_E2E").plan_experiment()
    DefaultPreprocessor().run("Dataset903_E2E", "3d_fullres", "ATKPlans", num_processes=1)

    # tiny configuration that reuses the 3d_fullres preprocessed data
    plans_file = os.path.join(pp, "Dataset903_E2E", "ATKPlans.json")
    plans = load_json(plans_file)
    fullres = plans["configurations"]["3d_fullres"]
    plans["configurations"]["tiny"] = {
        "inherits_from": "3d_fullres",
        "data_identifier": fullres["data_identifier"],
        "patch_size": [16, 16, 16],
        "batch_size": 2,
        "UNet_base_num_features": 4,
        "unet_max_num_features": 8,
        "pool_op_kernel_sizes": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
        "conv_kernel_sizes": [[3, 3, 3]] * 3,
        "n_conv_per_stage_encoder": [1, 1, 1],
        "n_conv_per_stage_decoder": [1, 1],
        "num_pool_per_axis": [2, 2, 2],
        "batch_dice": True,
    }
    save_json(plans, plans_file, sort_keys=False)

    from dataclasses import replace
    from anatomask_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(
        name="ATKTrainerTest", num_epochs=2, num_iterations_per_epoch=3,
        num_val_iterations_per_epoch=2, compute_dtype="float32",
        num_workers=1, save_every=1, initial_lr=1e-2,
    )
    dataset_json = load_json(os.path.join(pp, "Dataset903_E2E", "dataset.json"))
    trainer = Trainer(plans_file, "tiny", 0, dataset_json, cfg)
    trainer.run_training()
    return trainer, tmp_path


def test_training_produces_checkpoints_and_logs(trained):
    trainer, _ = trained
    out = trainer.output_folder
    assert os.path.isfile(os.path.join(out, "checkpoint_final.npz"))
    assert os.path.isfile(os.path.join(out, "checkpoint_best.npz"))
    lg = trainer.logger.logging
    assert len(lg["train_losses"]) == 2
    assert all(np.isfinite(v) for v in lg["train_losses"])
    assert lg["ema_fg_dice"][-1] is not None
    assert os.path.isfile(os.path.join(out, "debug.json"))
    assert os.path.isfile(os.path.join(out, "progress.png"))


def test_splits_file_created(trained):
    trainer, _ = trained
    splits_file = os.path.join(trainer.preprocessed_dataset_folder_base, "splits_final.json")
    assert os.path.isfile(splits_file)
    from anatomask_tpu.plans.plans_handler import load_json
    splits = load_json(splits_file)
    assert len(splits) == 5
    assert set(splits[0]["train"]) | set(splits[0]["val"]) == {
        f"case_{i:03d}" for i in range(6)
    }
    assert not set(splits[0]["train"]) & set(splits[0]["val"])


def test_checkpoint_resume(trained):
    trainer, _ = trained
    from anatomask_tpu.training.trainer import Trainer, TrainerConfig
    from anatomask_tpu.plans.plans_handler import load_json

    cfg = trainer.cfg
    t2 = Trainer(
        trainer.plans_manager.plans, "tiny", 0, trainer.dataset_json, cfg,
        output_folder=trainer.output_folder_base,
    )
    t2.initialize()
    t2.load_checkpoint("checkpoint_final.npz")
    assert t2.current_epoch == 2
    # weights survive the round trip
    import jax
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(t2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_actual_validation_runs(trained):
    trainer, _ = trained
    metrics = trainer.perform_actual_validation()
    assert "foreground_mean" in metrics
    assert "Dice" in metrics["foreground_mean"]
    val_dir = os.path.join(trainer.output_folder, "validation")
    assert os.path.isfile(os.path.join(val_dir, "summary.json"))
    ending = trainer.dataset_json["file_ending"]
    preds = [f for f in os.listdir(val_dir) if f.endswith(ending)]
    assert len(preds) == len(trainer.do_split()[1])


def test_benchmark_result_written(trained):
    trainer, tmp_path = trained
    from dataclasses import replace
    from anatomask_tpu.training.trainer import Trainer
    # val iters > 0: the no-dataloading val dummy must be patch-sized, not
    # augmentation-margin-sized (regression: skip-concat shape crash on TPU)
    cfg = replace(trainer.cfg, name="ATKTrainerBench", benchmark=True,
                  benchmark_no_dataloading=True, num_epochs=1,
                  num_iterations_per_epoch=2, num_val_iterations_per_epoch=1)
    t = Trainer(trainer.plans_manager.plans, "tiny", 1, trainer.dataset_json, cfg,
                output_folder=os.path.join(str(tmp_path), "bench_out"))
    t.run_training()
    assert os.path.isfile(os.path.join(t.output_folder, "benchmark_result.json"))


def test_2d_configuration_training(trained):
    """2D configs are promoted to singleton-3D; train a tiny 2D net e2e."""
    trainer, tmp_path = trained
    import os
    from anatomask_tpu.plans.plans_handler import load_json, save_json
    from anatomask_tpu.training.trainer import Trainer, TrainerConfig

    plans = dict(trainer.plans_manager.plans)
    fullres = plans["configurations"]["3d_fullres"]
    plans["configurations"]["tiny2d"] = {
        "inherits_from": "3d_fullres",
        "data_identifier": fullres["data_identifier"],
        "patch_size": [16, 16],
        "batch_size": 2,
        "UNet_base_num_features": 2,
        "unet_max_num_features": 4,
        "pool_op_kernel_sizes": [[1, 1], [2, 2]],
        "conv_kernel_sizes": [[3, 3]] * 2,
        "num_pool_per_axis": [1, 1],
        "n_conv_per_stage_encoder": [1, 1],
        "n_conv_per_stage_decoder": [1],
        "batch_dice": True,
    }
    cfg = TrainerConfig(name="ATKTrainer2DT", num_epochs=1, num_iterations_per_epoch=2,
                        num_val_iterations_per_epoch=1, compute_dtype="float32",
                        num_workers=1)
    t = Trainer(plans, "tiny2d", 0, trainer.dataset_json, cfg,
                output_folder=os.path.join(str(tmp_path), "out2d"))
    assert t.configuration_manager.patch_size == [1, 16, 16]
    assert t.configuration_manager.conv_kernel_sizes[0] == [1, 3, 3]
    t.run_training()
    import numpy as np
    assert np.isfinite(t.logger.logging["train_losses"][0])


def test_predictor_from_trained_model_folder(trained):
    """The full user inference path: load fold checkpoints from the results
    tree, preprocess raw images on the fly, sliding-window predict, export."""
    trainer, tmp_path = trained
    import numpy as np
    from anatomask_tpu.inference.predictor import Predictor
    from anatomask_tpu import paths

    pred = Predictor(tile_batch_size=1, use_mirroring=True)
    pred.initialize_from_trained_model_folder(trainer.output_folder_base, use_folds=[0])
    assert pred.configuration_manager.patch_size == [16, 16, 16]

    raw_images = os.path.join(paths.require("raw"), "Dataset903_E2E", "imagesTr")
    out_dir = os.path.join(str(tmp_path), "preds_from_files")
    results = pred.predict_from_files(raw_images, out_dir, save_probabilities=True)
    assert len(results) == 6
    ending = trainer.dataset_json["file_ending"]
    outs = [f for f in os.listdir(out_dir) if f.endswith(ending)]
    assert len(outs) == 6
    assert len([f for f in os.listdir(out_dir) if f.endswith(".npz")
                and not f.endswith(".props.npz")]) == 6
    # predictions restore original geometry
    from anatomask_tpu.imageio.nifti import NiftiIO
    seg, props = NiftiIO().read_seg(os.path.join(out_dir, outs[0]))
    assert seg.shape[1:] == (22, 24, 26)
    # overwrite=False skips completed cases
    again = pred.predict_from_files(raw_images, out_dir, overwrite=False,
                                    save_probabilities=True)
    assert len(again) == 0


def test_ensemble_folders_roundtrip(trained, tmp_path_factory):
    """Ensembling a prediction folder with itself must reproduce the same
    segmentations (exercises the full ensemble_folders path)."""
    trainer, tmp_path = trained
    pred_dir = os.path.join(str(tmp_path), "preds_from_files")
    if not os.path.isdir(pred_dir):  # self-sufficient: produce predictions
        from anatomask_tpu.inference.predictor import Predictor
        from anatomask_tpu import paths
        pred = Predictor(tile_batch_size=1)
        pred.initialize_from_trained_model_folder(trainer.output_folder_base, use_folds=[0])
        pred.predict_from_files(
            os.path.join(paths.require("raw"), "Dataset903_E2E", "imagesTr"),
            pred_dir, save_probabilities=True)
    import shutil
    from anatomask_tpu.plans.plans_handler import save_json
    # ensemble_folders needs dataset/plans json in the input folder
    save_json(trainer.dataset_json, os.path.join(pred_dir, "dataset.json"))
    save_json(trainer.plans_manager.plans, os.path.join(pred_dir, "plans.json"))
    out = str(tmp_path_factory.mktemp("ens"))
    from anatomask_tpu.ensembling.ensemble import ensemble_folders
    ensemble_folders([pred_dir, pred_dir], out)
    ending = trainer.dataset_json["file_ending"]
    from anatomask_tpu.imageio.nifti import NiftiIO
    io = NiftiIO()
    for f in os.listdir(out):
        if f.endswith(ending):
            a, _ = io.read_seg(os.path.join(out, f))
            b, _ = io.read_seg(os.path.join(pred_dir, f))
            np.testing.assert_array_equal(a, b)


def test_accumulate_cv_results_single_fold(trained):
    trainer, tmp_path = trained
    if not os.path.isdir(os.path.join(trainer.output_folder, "validation")):
        trainer.perform_actual_validation(save_probabilities=True)
    from anatomask_tpu.evaluation.find_best_configuration import accumulate_cv_results
    out = os.path.join(str(tmp_path), "crossval_merged")
    metrics = accumulate_cv_results(trainer.output_folder_base, out, folds=[0])
    assert "Dice" in metrics["foreground_mean"]
    assert os.path.isfile(os.path.join(out, "summary.json"))
