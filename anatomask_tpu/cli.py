"""Command-line entry points.

Capability parity: the reference's 21 console scripts
(/root/reference/pyproject.toml [project.scripts]): plan-and-preprocess family,
train (with --c resume / --val / -pretrained_weights / --npz /
--disable_checkpointing), predict, evaluate, ensemble, find-best-configuration,
postprocessing apply/determine, model export/install, plans transfer, MSD
conversion, dataset integrity check.
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly so
# `JAX_PLATFORMS=cpu atk_train ...` really runs on CPU (same workaround as
# tests/conftest.py and __graft_entry__.py).
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent XLA compilation cache for every CLI entry: the big jitted train
# steps take minutes to compile (tens of minutes through a remote-compile
# tunnel); a warm cache makes restarts/resumes near-instant. Override the
# location with ATK_COMPILE_CACHE; set it empty to disable.
_cache_dir = os.environ.get(
    "ATK_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_cli_cache"))
if _cache_dir:
    try:
        import jax as _jax
        os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from anatomask_tpu.plans.plans_handler import load_json


# --- planning / preprocessing -------------------------------------------------

def extract_fingerprint_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_extract_fingerprint")
    p.add_argument("-d", nargs="+", required=True, help="dataset name(s) or id(s)")
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    a = p.parse_args(argv)
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    for d in a.d:
        if a.verify_dataset_integrity:
            from anatomask_tpu.planning.verify_integrity import verify_dataset_integrity
            from anatomask_tpu.paths import require
            from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
            errs = verify_dataset_integrity(
                os.path.join(require("raw"), maybe_convert_to_dataset_name(d)), a.np)
            if errs:
                raise RuntimeError(f"dataset {d} failed integrity check")
        DatasetFingerprintExtractor(d, a.np).run(overwrite_existing=True)


def plan_experiment_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_plan_experiment")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-gpu_memory_target", type=float, default=8.0)
    p.add_argument("-overwrite_plans_name", default="ATKPlans")
    p.add_argument("-overwrite_target_spacing", nargs="+", type=float, default=None)
    a = p.parse_args(argv)
    from anatomask_tpu.planning.planner import ExperimentPlanner
    for d in a.d:
        ExperimentPlanner(
            d, memory_target_gb=a.gpu_memory_target, plans_name=a.overwrite_plans_name,
            overwrite_target_spacing=a.overwrite_target_spacing,
        ).plan_experiment()


def preprocess_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_preprocess")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres"])
    p.add_argument("-plans_name", default="ATKPlans")
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(argv)
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from anatomask_tpu.paths import require
    from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
    for d in a.d:
        name = maybe_convert_to_dataset_name(d)
        plans = load_json(os.path.join(require("preprocessed"), name, a.plans_name + ".json"))
        for c in a.c:
            if c not in plans["configurations"]:
                print(f"skipping {c} (not in plans)")
                continue
            DefaultPreprocessor().run(d, c, a.plans_name, a.np)


def plan_and_preprocess_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_plan_and_preprocess")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres"])
    p.add_argument("-plans_name", default="ATKPlans")
    p.add_argument("-np", type=int, default=8)
    p.add_argument("-gpu_memory_target", type=float, default=8.0)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    p.add_argument("--no_pp", action="store_true", help="plan only, skip preprocessing")
    a = p.parse_args(argv)
    from anatomask_tpu.planning.planner import plan_and_preprocess
    for d in a.d:
        if a.verify_dataset_integrity:
            from anatomask_tpu.planning.verify_integrity import verify_dataset_integrity
            from anatomask_tpu.paths import require
            from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
            errs = verify_dataset_integrity(
                os.path.join(require("raw"), maybe_convert_to_dataset_name(d)), a.np)
            if errs:
                raise RuntimeError(f"dataset {d} failed integrity check")
        plan_and_preprocess(
            d, configurations=() if a.no_pp else tuple(a.c), plans_name=a.plans_name,
            num_processes=a.np, memory_target_gb=a.gpu_memory_target, overwrite=True,
        )


# --- training ----------------------------------------------------------------

def train_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_train")
    p.add_argument("dataset_name_or_id")
    p.add_argument("configuration")
    p.add_argument("fold", help="0-4 or 'all'")
    p.add_argument("-tr", default="ATKTrainer")
    p.add_argument("-p", default="ATKPlans")
    p.add_argument("-pretrained_weights", default=None,
                   help="pretraining checkpoint whose encoder is transferred in")
    p.add_argument("--c", action="store_true", dest="continue_training")
    p.add_argument("--val", action="store_true", help="only run final validation")
    p.add_argument("--val_best", action="store_true")
    p.add_argument("--npz", action="store_true", help="save softmax probabilities")
    p.add_argument("--disable_checkpointing", action="store_true")
    p.add_argument("-num_gpus", type=int, default=None,
                   help="cap the data mesh to the first N devices (reference "
                        "run_training.py -num_gpus analog; default: all)")
    a = p.parse_args(argv)
    if a.num_gpus:
        os.environ["ATK_NUM_DEVICES"] = str(a.num_gpus)

    from anatomask_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()  # multi-host: DCN across hosts, one SPMD program
    from anatomask_tpu.paths import require
    from anatomask_tpu.training.trainer import Trainer, get_trainer_config
    from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
    name = maybe_convert_to_dataset_name(a.dataset_name_or_id)
    pp = os.path.join(require("preprocessed"), name)
    dataset_json = load_json(os.path.join(pp, "dataset.json"))
    cfg = get_trainer_config(a.tr)
    fold = a.fold if a.fold == "all" else int(a.fold)
    trainer = Trainer(os.path.join(pp, a.p + ".json"), a.configuration, fold, dataset_json, cfg)
    trainer.disable_checkpointing = a.disable_checkpointing
    if a.val or a.val_best:
        trainer.initialize()
        trainer.load_checkpoint("checkpoint_best.npz" if a.val_best else "checkpoint_final.npz")
        trainer.perform_actual_validation(save_probabilities=a.npz)
        return
    if a.pretrained_weights:
        trainer.initialize()
        from anatomask_tpu.ssl.pretrain import load_ssl_encoder_into_trainer
        load_ssl_encoder_into_trainer(trainer, a.pretrained_weights)
    trainer.run_training(continue_training=a.continue_training)
    trainer.perform_actual_validation(save_probabilities=a.npz)


def pretrain_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_pretrain")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-method", choices=["spark", "anatomask"], default="anatomask")
    p.add_argument("-model", choices=["S", "B", "L", "H"], default="B")
    p.add_argument("-patch_size", nargs=3, type=int, default=[112, 112, 128])
    p.add_argument("-batch_size", type=int, default=4)
    p.add_argument("-mask_ratio", type=float, default=0.6)
    p.add_argument("-epochs", type=int, default=1000)
    p.add_argument("-iters_per_epoch", type=int, default=None)
    p.add_argument("-compute_dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("-lr", type=float, default=None)
    p.add_argument("-p", default="ATKPlans")
    p.add_argument("-c", dest="configuration", default="3d_fullres")
    p.add_argument("-fold", type=int, default=0)
    p.add_argument("--no_guide", action="store_true", help="disable easy-to-hard curriculum")
    p.add_argument("--continue", action="store_true", dest="continue_training")
    p.add_argument("-grad_accum", type=int, default=2,
                   help="microbatch gradient-accumulation steps (exact for "
                        "per-sample norms; 2 fits the reference STUNet-B bs-4 "
                        "112x112x128 workload in 16G HBM)")
    p.add_argument("-num_gpus", type=int, default=None,
                   help="cap the data mesh to the first N devices (default: all)")
    a = p.parse_args(argv)
    if a.num_gpus:
        os.environ["ATK_NUM_DEVICES"] = str(a.num_gpus)
    from anatomask_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    from anatomask_tpu.ssl.pretrain import PretrainConfig, PretrainTrainer
    lr = a.lr if a.lr is not None else (2e-4 if a.method == "spark" else 1e-4)
    cfg = PretrainConfig(
        method=a.method, model_size=a.model, patch_size=tuple(a.patch_size),
        batch_size=a.batch_size, mask_ratio=a.mask_ratio, num_epochs=a.epochs,
        iters_per_epoch=a.iters_per_epoch, compute_dtype=a.compute_dtype,
        lr=lr, guide=not a.no_guide, grad_accum_steps=a.grad_accum,
    )
    PretrainTrainer(a.dataset_name_or_id, cfg, a.p, a.configuration, a.fold).run_pretraining(
        continue_training=a.continue_training)


# --- inference ---------------------------------------------------------------

def predict_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_predict")
    p.add_argument("-i", required=True, help="input folder")
    p.add_argument("-o", required=True, help="output folder")
    p.add_argument("-d", required=True, help="dataset name or id")
    p.add_argument("-c", required=True, help="configuration")
    p.add_argument("-tr", default="ATKTrainer")
    p.add_argument("-p", default="ATKPlans")
    p.add_argument("-f", nargs="+", default=None, help="folds")
    p.add_argument("-chk", default="checkpoint_final.npz")
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--continue_prediction", action="store_true")
    p.add_argument("-num_parts", type=int, default=1)
    p.add_argument("-part_id", type=int, default=0)
    p.add_argument("-prev_stage_predictions", default=None)
    # reference parity: predict_from_raw_data runs under torch.autocast
    # (half-precision tiles); bf16 tile compute with fp32 Gaussian
    # accumulation is the TPU analog and ~matches the training dtype
    p.add_argument("-compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    a = p.parse_args(argv)

    import jax.numpy as jnp
    from anatomask_tpu.inference.predictor import Predictor
    from anatomask_tpu.paths import require
    from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
    name = maybe_convert_to_dataset_name(a.d)
    model_dir = os.path.join(require("results"), name, f"{a.tr}__{a.p}__{a.c}")
    predictor = Predictor(tile_step_size=a.step_size, use_mirroring=not a.disable_tta,
                          dtype=jnp.bfloat16 if a.compute_dtype == "bfloat16"
                          else jnp.float32)
    folds = None if a.f is None else [f if f == "all" else int(f) for f in a.f]
    predictor.initialize_from_trained_model_folder(model_dir, folds, a.chk)
    predictor.predict_from_files(
        a.i, a.o, save_probabilities=a.save_probabilities,
        overwrite=not a.continue_prediction,
        folder_with_segs_from_prev_stage=a.prev_stage_predictions,
        num_parts=a.num_parts, part_id=a.part_id,
    )


# --- evaluation / ensembling / selection -------------------------------------

def evaluate_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_evaluate")
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-djfile", default=None, help="dataset.json path")
    p.add_argument("-o", default=None, help="output summary.json")
    p.add_argument("-np", type=int, default=4)
    a = p.parse_args(argv)
    from anatomask_tpu.evaluation.metrics import compute_metrics_on_folder
    from anatomask_tpu.imageio.registry import determine_reader_writer_from_dataset_json
    from anatomask_tpu.plans.label_handling import LabelManager
    djfile = a.djfile or os.path.join(a.pred_folder, "dataset.json")
    dataset_json = load_json(djfile)
    lm = LabelManager(dataset_json["labels"], dataset_json.get("regions_class_order"))
    rw = determine_reader_writer_from_dataset_json(dataset_json)()
    out = a.o or os.path.join(a.pred_folder, "summary.json")
    m = compute_metrics_on_folder(
        a.gt_folder, a.pred_folder, out, rw, dataset_json["file_ending"],
        lm.foreground_regions if lm.has_regions else lm.foreground_labels,
        lm.ignore_label, a.np,
    )
    print("foreground mean Dice:", m["foreground_mean"]["Dice"])


def ensemble_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_ensemble")
    p.add_argument("-i", nargs="+", required=True, help="input folders with .npz probabilities")
    p.add_argument("-o", required=True)
    p.add_argument("-np", type=int, default=4)
    p.add_argument("--save_npz", action="store_true")
    a = p.parse_args(argv)
    from anatomask_tpu.ensembling.ensemble import ensemble_folders
    ensemble_folders(a.i, a.o, a.save_npz, a.np)


def find_best_configuration_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_find_best_configuration")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres", "3d_cascade_fullres"])
    p.add_argument("-tr", nargs="+", default=["ATKTrainer"])
    p.add_argument("-p", nargs="+", default=["ATKPlans"])
    p.add_argument("-f", nargs="+", type=int, default=[0, 1, 2, 3, 4])
    p.add_argument("--disable_ensembling", action="store_true")
    p.add_argument("-np", type=int, default=4)
    a = p.parse_args(argv)
    from anatomask_tpu.evaluation.find_best_configuration import find_best_configuration
    find_best_configuration(
        a.dataset_name_or_id, a.c, a.tr, a.p, a.f,
        allow_ensembling=not a.disable_ensembling, num_processes=a.np,
    )


# --- postprocessing ----------------------------------------------------------

def determine_postprocessing_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_determine_postprocessing")
    p.add_argument("-i", required=True, help="predictions folder")
    p.add_argument("-ref", required=True, help="ground-truth folder")
    p.add_argument("-djfile", required=True)
    p.add_argument("-np", type=int, default=4)
    a = p.parse_args(argv)
    from anatomask_tpu.imageio.registry import determine_reader_writer_from_dataset_json
    from anatomask_tpu.plans.label_handling import LabelManager
    from anatomask_tpu.postprocessing.components import determine_postprocessing
    dataset_json = load_json(a.djfile)
    lm = LabelManager(dataset_json["labels"], dataset_json.get("regions_class_order"))
    determine_postprocessing(
        a.i, a.ref, determine_reader_writer_from_dataset_json(dataset_json)(),
        dataset_json["file_ending"],
        lm.foreground_regions if lm.has_regions else lm.foreground_labels,
        lm.ignore_label, num_processes=a.np,
    )


def apply_postprocessing_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_apply_postprocessing")
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-pp_file", required=True, help="postprocessing.json")
    p.add_argument("-djfile", required=True)
    p.add_argument("-np", type=int, default=4)
    a = p.parse_args(argv)
    from anatomask_tpu.imageio.registry import determine_reader_writer_from_dataset_json
    from anatomask_tpu.postprocessing.components import (
        apply_postprocessing_to_folder, load_postprocessing_description,
    )
    dataset_json = load_json(a.djfile)
    pp_fns = load_postprocessing_description(a.pp_file)
    apply_postprocessing_to_folder(
        a.i, a.o, pp_fns, determine_reader_writer_from_dataset_json(dataset_json)(),
        dataset_json["file_ending"], a.np,
    )


# --- model sharing / plans / conversion --------------------------------------

def export_model_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_export_model")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-o", required=True, help="output zip")
    p.add_argument("-tr", default="ATKTrainer")
    p.add_argument("-p", default="ATKPlans")
    p.add_argument("-c", nargs="+", default=["3d_fullres"])
    p.add_argument("-f", nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--not_strict", action="store_true")
    a = p.parse_args(argv)
    from anatomask_tpu.utils.model_sharing import export_pretrained_model
    export_pretrained_model(a.dataset_name_or_id, a.o, a.tr, a.p, a.c, a.f,
                            strict=not a.not_strict)


def install_model_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_install_model")
    p.add_argument("-i", required=True, help="model zip file")
    a = p.parse_args(argv)
    from anatomask_tpu.utils.model_sharing import install_model_from_zip_file
    install_model_from_zip_file(a.i)


def move_plans_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_move_plans_between_datasets")
    p.add_argument("-s", required=True, help="source dataset (plans origin)")
    p.add_argument("-t", required=True, help="target dataset")
    p.add_argument("-sp", default="ATKPlans")
    p.add_argument("-tp", default=None)
    a = p.parse_args(argv)
    from anatomask_tpu.planning.move_plans import move_plans_between_datasets
    move_plans_between_datasets(a.s, a.t, a.sp, a.tp)


def convert_msd_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_convert_msd")
    p.add_argument("-i", required=True, help="MSD TaskXX_Name folder")
    p.add_argument("-overwrite_id", type=int, default=None)
    p.add_argument("-np", type=int, default=4)
    a = p.parse_args(argv)
    from anatomask_tpu.dataset_conversion.convert_msd import convert_msd_dataset
    convert_msd_dataset(a.i, a.overwrite_id, a.np)


def convert_challenge_entry(argv: Optional[List[str]] = None):
    """Challenge dataset converters (reference Dataset*_*.py scripts)."""
    p = argparse.ArgumentParser("atk_convert_challenge")
    sub = p.add_subparsers(dest="task", required=True)
    for task, default_id in (("kits23", 220), ("amos1", 218), ("amos2", 219),
                             ("autopet", 221), ("emidec", 115),
                             ("fluo_c3dh", 73), ("roads", 120)):
        sp = sub.add_parser(task)
        sp.add_argument("input_folder")
        sp.add_argument("-d", type=int, default=default_id)
        if task == "emidec":
            sp.add_argument("-t", dest="test_dir", default=None)
        if task == "fluo_c3dh":
            sp.add_argument("-t", dest="test_dir", default=None)
    sp = sub.add_parser("mnms")
    sp.add_argument("input_folder")
    sp.add_argument("-csv", default="211230_M&Ms_Dataset_information_diagnosis_opendataset.csv")
    sp.add_argument("-d", type=int, default=114)
    sp.add_argument("--custom_splits", action="store_true",
                    help="append vendor-stratified custom splits (run after "
                         "plan+preprocess created splits_final.json)")
    sp = sub.add_parser("old_nnunet")
    sp.add_argument("input_folder")
    sp.add_argument("output_dataset_name")
    sp = sub.add_parser("acdc")
    sp.add_argument("input_folder")
    sp.add_argument("-d", type=int, default=27)
    sp = sub.add_parser("brats_regions")
    sp.add_argument("input_folder")
    sp.add_argument("-d", type=int, default=137)
    sp.add_argument("--no_regions", action="store_true",
                    help="plain 3-class labels instead of BraTS regions")
    sp = sub.add_parser("brats_convert_back",
                        help="convert predictions back to the BraTS labeling "
                             "convention for submission")
    sp.add_argument("input_folder")
    sp.add_argument("output_folder")
    a = p.parse_args(argv)
    from anatomask_tpu.dataset_conversion import convert_challenges as cc
    if a.task == "kits23":
        cc.convert_kits2023(a.input_folder, a.d)
    elif a.task == "amos1":
        cc.convert_amos_task1(a.input_folder, a.d)
    elif a.task == "amos2":
        cc.convert_amos_task2(a.input_folder, a.d)
    elif a.task == "autopet":
        cc.convert_autopet(a.input_folder, a.d)
    elif a.task == "emidec":
        cc.convert_emidec(a.input_folder, a.test_dir, a.d)
    elif a.task == "fluo_c3dh":
        cc.convert_fluo_c3dh_a549_sim(a.input_folder, a.test_dir, a.d)
    elif a.task == "roads":
        cc.convert_road_segmentation(a.input_folder, a.d)
    elif a.task == "mnms":
        if a.custom_splits:
            cc.create_mnms_custom_splits(a.input_folder, a.csv, a.d)
        else:
            cc.convert_mnms(a.input_folder, a.csv, a.d)
    elif a.task == "old_nnunet":
        cc.convert_old_nnunet_dataset(a.input_folder, a.output_dataset_name)
    elif a.task == "acdc":
        from anatomask_tpu.dataset_conversion.convert_acdc import convert_acdc_dataset
        convert_acdc_dataset(a.input_folder, a.d)
    elif a.task == "brats_regions":
        from anatomask_tpu.dataset_conversion.convert_brats import convert_brats_dataset
        convert_brats_dataset(a.input_folder, a.d, use_regions=not a.no_regions)
    elif a.task == "brats_convert_back":
        from anatomask_tpu.dataset_conversion.convert_brats import (
            convert_folder_back_to_brats)
        convert_folder_back_to_brats(a.input_folder, a.output_folder)


def plot_overlay_pngs_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_plot_overlay_pngs")
    p.add_argument("-i", required=True, help="images folder")
    p.add_argument("-s", required=True, help="segmentations folder")
    p.add_argument("-o", required=True, help="output folder")
    p.add_argument("-djfile", required=True)
    p.add_argument("-np", type=int, default=4)
    a = p.parse_args(argv)
    from anatomask_tpu.utils.overlay_plots import generate_overlays_for_folder
    generate_overlays_for_folder(a.i, a.s, a.o, load_json(a.djfile), a.np)


def accumulate_crossval_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_accumulate_crossval_results")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-c", default="3d_fullres")
    p.add_argument("-tr", default="ATKTrainer")
    p.add_argument("-p", default="ATKPlans")
    p.add_argument("-f", nargs="+", type=int, default=[0, 1, 2, 3, 4])
    p.add_argument("-o", default=None)
    a = p.parse_args(argv)
    from anatomask_tpu.evaluation.find_best_configuration import (
        accumulate_cv_results, folder_for_model,
    )
    from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
    name = maybe_convert_to_dataset_name(a.dataset_name_or_id)
    model = folder_for_model(name, a.tr, a.p, a.c)
    out = a.o or (model + "_crossval_results")
    m = accumulate_cv_results(model, out, a.f)
    print("foreground mean Dice:", m["foreground_mean"]["Dice"])


def download_model_entry(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("atk_download_model")
    p.add_argument("-url", required=True)
    a = p.parse_args(argv)
    import urllib.request
    import tempfile
    from anatomask_tpu.utils.model_sharing import install_model_from_zip_file
    with tempfile.NamedTemporaryFile(suffix=".zip", delete=False) as f:
        print(f"downloading {a.url} ...")
        urllib.request.urlretrieve(a.url, f.name)
        install_model_from_zip_file(f.name)
