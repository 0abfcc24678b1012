"""Postprocessing, ensembling, model sharing, dataset conversion, integrity,
plans transfer, CLI smoke tests."""
import json
import os

import numpy as np
import pytest

from synthetic import make_synthetic_dataset, setup_env


def test_remove_all_but_largest_component():
    from anatomask_tpu.postprocessing.components import (
        remove_all_but_largest_component_from_segmentation,
    )
    seg = np.zeros((10, 10, 10), dtype=np.uint8)
    seg[1:4, 1:4, 1:4] = 1      # big component (27 voxels)
    seg[7:9, 7:9, 7:9] = 1      # small component (8 voxels)
    seg[5, 5, 5] = 2
    out = remove_all_but_largest_component_from_segmentation(seg, [1])
    assert (out[1:4, 1:4, 1:4] == 1).all()
    assert (out[7:9, 7:9, 7:9] == 0).all()
    assert out[5, 5, 5] == 2  # other labels untouched


def test_remove_component_region():
    from anatomask_tpu.postprocessing.components import (
        remove_all_but_largest_component_from_segmentation,
    )
    seg = np.zeros((8, 8, 8), dtype=np.uint8)
    seg[0:3, 0:3, 0:3] = 1
    seg[5:7, 5:7, 5:7] = 2  # region (1,2): two components; (1s) is larger
    out = remove_all_but_largest_component_from_segmentation(seg, [(1, 2)])
    assert (out[0:3, 0:3, 0:3] == 1).all()
    assert (out[5:7, 5:7, 5:7] == 0).all()


def test_determine_postprocessing_keeps_helpful_step(tmp_path, rng):
    from anatomask_tpu.postprocessing.components import determine_postprocessing
    from anatomask_tpu.imageio.numpy_io import NumpyIO

    ref_dir = tmp_path / "ref"; pred_dir = tmp_path / "pred"
    ref_dir.mkdir(); pred_dir.mkdir()
    for i in range(2):
        gt = np.zeros((12, 12, 12), dtype=np.uint8)
        gt[2:7, 2:7, 2:7] = 1
        pred = gt.copy()
        pred[10, 10, 10] = 1  # spurious island -> removing it helps
        np.save(ref_dir / f"case{i}.npy", gt)
        np.save(pred_dir / f"case{i}.npy", pred)
    pp_fns, metrics = determine_postprocessing(
        str(pred_dir), str(ref_dir), NumpyIO(), ".npy", [1], num_processes=1)
    assert len(pp_fns) >= 1
    assert metrics["foreground_mean"]["Dice"] == pytest.approx(1.0)
    assert os.path.isfile(pred_dir / "postprocessing.json")


def test_average_probabilities(tmp_path, rng):
    from anatomask_tpu.ensembling.ensemble import average_probabilities
    a = rng.rand(2, 4, 4, 4).astype(np.float32)
    b = rng.rand(2, 4, 4, 4).astype(np.float32)
    np.savez_compressed(tmp_path / "a.npz", probabilities=a)
    np.savez_compressed(tmp_path / "b.npz", probabilities=b)
    avg = average_probabilities([str(tmp_path / "a.npz"), str(tmp_path / "b.npz")])
    np.testing.assert_allclose(avg, (a + b) / 2, atol=1e-6)


def test_verify_dataset_integrity_ok(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    ds_dir, _ = make_synthetic_dataset(raw, "Dataset905_VI", num_cases=3)
    from anatomask_tpu.planning.verify_integrity import verify_dataset_integrity
    errors = verify_dataset_integrity(ds_dir, num_processes=1)
    assert errors == []


def test_verify_dataset_integrity_catches_bad_labels(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    ds_dir, dsj = make_synthetic_dataset(raw, "Dataset906_VI", num_cases=2)
    # corrupt one label file with an out-of-range value
    from anatomask_tpu.imageio.nifti import read_nifti, write_nifti
    f = os.path.join(ds_dir, "labelsTr", "case_000.nii.gz")
    data, hdr = read_nifti(f)
    data = data.copy()
    data[0, 0, 0] = 17
    write_nifti(f, data.astype(np.uint8), header=hdr)
    from anatomask_tpu.planning.verify_integrity import verify_dataset_integrity
    errors = verify_dataset_integrity(ds_dir, num_processes=1)
    assert any("unexpected label" in e for e in errors)


def test_move_plans_between_datasets(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset907_Src", num_cases=3)
    make_synthetic_dataset(raw, "Dataset908_Tgt", num_cases=3)
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    DatasetFingerprintExtractor("Dataset907_Src", 1).run()
    ExperimentPlanner("Dataset907_Src").plan_experiment()
    from anatomask_tpu.planning.move_plans import move_plans_between_datasets
    out = move_plans_between_datasets("Dataset907_Src", "Dataset908_Tgt")
    from anatomask_tpu.plans.plans_handler import load_json
    plans = load_json(out)
    assert plans["dataset_name"] == "Dataset908_Tgt"
    for cfg in plans["configurations"].values():
        if "data_identifier" in cfg:
            assert cfg["data_identifier"].startswith("ATKPlans")


def test_model_export_install_roundtrip(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    # fabricate a minimal trained-model folder
    model_dir = os.path.join(res, "Dataset909_MS", "ATKTrainer__ATKPlans__3d_fullres")
    os.makedirs(os.path.join(model_dir, "fold_0"), exist_ok=True)
    with open(os.path.join(model_dir, "plans.json"), "w") as f:
        json.dump({"dataset_name": "Dataset909_MS"}, f)
    with open(os.path.join(model_dir, "dataset.json"), "w") as f:
        json.dump({"labels": {"background": 0}}, f)
    from anatomask_tpu.training.checkpoint import save_checkpoint
    save_checkpoint(os.path.join(model_dir, "fold_0", "checkpoint_final.npz"),
                    {"network_weights": {"w": np.ones(3)}}, {"trainer_name": "ATKTrainer"})
    from anatomask_tpu.utils.model_sharing import (
        export_pretrained_model, install_model_from_zip_file,
    )
    zip_path = str(tmp_path / "model.zip")
    export_pretrained_model("Dataset909_MS", zip_path, folds=[0])
    # install into a fresh results dir
    os.environ["ATK_results"] = str(tmp_path / "results2")
    from anatomask_tpu import paths
    paths.refresh()
    install_model_from_zip_file(zip_path)
    assert os.path.isfile(os.path.join(
        str(tmp_path / "results2"), "Dataset909_MS",
        "ATKTrainer__ATKPlans__3d_fullres", "fold_0", "checkpoint_final.npz"))


def test_generate_dataset_json(tmp_path):
    from anatomask_tpu.dataset_conversion.generate_dataset_json import generate_dataset_json
    d = generate_dataset_json(
        str(tmp_path), {"0": "CT"}, {"background": 0, "organ": (1, 2), "tumor": 2},
        10, ".nii.gz", regions_class_order=(1, 2))
    assert os.path.isfile(tmp_path / "dataset.json")
    assert d["labels"]["organ"] == [1, 2]


def test_integration_test_datasets(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    from anatomask_tpu.dataset_conversion.integration_test_datasets import (
        generate_integration_test_dataset,
    )
    out = generate_integration_test_dataset(997, "regions", num_cases=2)
    from anatomask_tpu.plans.plans_handler import load_json
    dsj = load_json(os.path.join(out, "dataset.json"))
    assert dsj["regions_class_order"] == [1, 2]
    assert len(os.listdir(os.path.join(out, "imagesTr"))) == 2

    out = generate_integration_test_dataset(998, "ignore", num_cases=2)
    dsj = load_json(os.path.join(out, "dataset.json"))
    assert dsj["labels"]["ignore"] == 3


def test_cli_plan_and_preprocess(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset910_CLI", num_cases=3)
    from anatomask_tpu.cli import plan_and_preprocess_entry
    plan_and_preprocess_entry(["-d", "910", "-c", "3d_fullres", "-np", "1",
                               "--verify_dataset_integrity"])
    assert os.path.isfile(os.path.join(pp, "Dataset910_CLI", "ATKPlans.json"))
    out_dir = os.path.join(pp, "Dataset910_CLI", "ATKPlans_3d_fullres")
    assert len([f for f in os.listdir(out_dir) if f.endswith(".npz")
                and not f.endswith(".props.npz")]) == 3


def test_convert_brats_style(tmp_path, rng):
    from anatomask_tpu.imageio.nifti import write_nifti
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "brats_src"
    for case in ["BraTS_001", "BraTS_002"]:
        d = src / case
        d.mkdir(parents=True)
        for mod in ("t1", "t1ce", "t2", "flair"):
            write_nifti(str(d / f"{case}_{mod}.nii.gz"),
                        rng.rand(8, 9, 10).astype(np.float32))
        seg = np.zeros((8, 9, 10), dtype=np.uint8)
        seg[2:4] = 1; seg[4:5] = 2; seg[5:6] = 4  # BraTS label 4
        write_nifti(str(d / f"{case}_seg.nii.gz"), seg)
    from anatomask_tpu.dataset_conversion.convert_brats import (
        convert_brats_dataset, convert_folder_back_to_brats,
        convert_labels_back_to_brats, remap_brats_labels)
    out = convert_brats_dataset(str(src), 937, "BraTSTest")
    assert len(os.listdir(os.path.join(out, "imagesTr"))) == 8  # 2 cases x 4 mods
    from anatomask_tpu.imageio.nifti import read_nifti
    seg_out, _ = read_nifti(os.path.join(out, "labelsTr", "BraTS_001.nii.gz"))
    # reference permutation (Dataset137_BraTS21.py:24-27): necrotic 1 -> 2,
    # edema 2 -> 1, enhancing (3 or legacy 4) -> 3
    assert set(np.unique(seg_out)) == {0, 1, 2, 3}
    assert np.all(seg_out[2:4] == 2) and np.all(seg_out[4:5] == 1)
    assert np.all(seg_out[5:6] == 3) and np.all(seg_out[6:] == 0)
    from anatomask_tpu.plans.plans_handler import load_json
    dsj = load_json(os.path.join(out, "dataset.json"))
    assert dsj["labels"]["whole_tumor"] == [1, 2, 3]
    assert dsj["labels"]["tumor_core"] == [2, 3]  # permuted convention
    # back-conversion inverts the permutation exactly (:33-38)
    train = np.arange(4, dtype=np.uint8)
    assert convert_labels_back_to_brats(train).tolist() == [0, 2, 1, 3]
    orig = np.array([0, 1, 2, 3], dtype=np.uint8)
    np.testing.assert_array_equal(
        convert_labels_back_to_brats(remap_brats_labels(orig)), orig)
    back_dir = tmp_path / "preds_back"
    n = convert_folder_back_to_brats(os.path.join(out, "labelsTr"), str(back_dir))
    assert n == 2
    back, _ = read_nifti(str(back_dir / "BraTS_001.nii.gz"))
    assert np.all(back[2:4] == 1) and np.all(back[4:5] == 2) and np.all(back[5:6] == 3)


def test_convert_brats21_naming(tmp_path, rng):
    """BraTS'21 per-case file naming (-t1n/-t1c/-t2w/-t2f/-seg,
    Dataset137_BraTS21.py:78-83) is accepted too."""
    from anatomask_tpu.imageio.nifti import write_nifti
    setup_env(tmp_path)
    src = tmp_path / "brats21_src"
    case = "BraTS2021_00001"
    d = src / case
    d.mkdir(parents=True)
    for mod in ("t1n", "t1c", "t2w", "t2f"):
        write_nifti(str(d / f"{case}-{mod}.nii.gz"),
                    rng.rand(6, 7, 8).astype(np.float32))
    seg = np.zeros((6, 7, 8), dtype=np.uint8)
    seg[1:2] = 1; seg[2:3] = 2; seg[3:4] = 3
    write_nifti(str(d / f"{case}-seg.nii.gz"), seg)
    from anatomask_tpu.dataset_conversion.convert_brats import convert_brats_dataset
    from anatomask_tpu.imageio.nifti import read_nifti
    out = convert_brats_dataset(str(src), 938, "BraTS21Test")
    seg_out, _ = read_nifti(os.path.join(out, "labelsTr", f"{case}.nii.gz"))
    assert np.all(seg_out[1:2] == 2) and np.all(seg_out[2:3] == 1)
    assert np.all(seg_out[3:4] == 3)


def test_convert_acdc_style(tmp_path, rng):
    from anatomask_tpu.imageio.nifti import write_nifti
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "acdc_src"
    for pat in ["patient001", "patient002"]:
        d = src / pat
        d.mkdir(parents=True)
        for frame in ["frame01", "frame12"]:
            write_nifti(str(d / f"{pat}_{frame}.nii.gz"),
                        rng.rand(6, 7, 8).astype(np.float32))
            write_nifti(str(d / f"{pat}_{frame}_gt.nii.gz"),
                        rng.randint(0, 4, (6, 7, 8)).astype(np.uint8))
    from anatomask_tpu.dataset_conversion.convert_acdc import convert_acdc_dataset
    out = convert_acdc_dataset(str(src), 927)
    assert len(os.listdir(os.path.join(out, "imagesTr"))) == 4  # 2 pats x 2 frames
    from anatomask_tpu.plans.plans_handler import load_json
    assert load_json(os.path.join(out, "dataset.json"))["numTraining"] == 4
