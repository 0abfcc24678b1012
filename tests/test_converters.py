"""Challenge dataset converters: synthetic source trees -> ATK raw layout,
dataset.json content, custom splits (reference Dataset*_*.py parity)."""
import json
import os

import numpy as np
import pytest

from synthetic import setup_env


def _write_nii(path, shape=(4, 5, 6), dtype=np.float32, value=None):
    from anatomask_tpu.imageio.nifti import write_nifti
    rng = np.random.RandomState(0)
    data = (rng.rand(*shape) * 10).astype(dtype) if value is None else \
        np.full(shape, value, dtype)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_nifti(path, data, spacing_xyz=(1, 1, 1))
    return data


def test_kits23(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "kits"
    for c in ("case_00000", "case_00001"):
        _write_nii(str(src / c / "imaging.nii.gz"))
        _write_nii(str(src / c / "segmentation.nii.gz"), dtype=np.uint8, value=1)
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_kits2023
    out = convert_kits2023(str(src))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["labels"]["kidney"] == [1, 2, 3]
    assert dj["labels"]["tumor"] == 2
    assert dj["regions_class_order"] == [1, 3, 2]
    assert dj["overwrite_image_reader_writer"] == "NibabelIOWithReorient"
    assert dj["numTraining"] == 2
    assert os.path.isfile(os.path.join(out, "imagesTr", "case_00000_0000.nii.gz"))
    assert os.path.isfile(os.path.join(out, "labelsTr", "case_00001.nii.gz"))


def test_amos_task1_ct_filter(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "amos"
    # ids 1 (CT) and 500 (MRI, excluded from task1 training); val id 2; test 450
    entries = {"training": [{"image": "./imagesTr/amos_0001.nii.gz"},
                            {"image": "./imagesTr/amos_0500.nii.gz"}],
               "validation": [{"image": "./imagesVa/amos_0002.nii.gz"}],
               "test": [{"image": "./imagesTs/amos_0450.nii.gz"}],
               "labels": {"0": "background", "1": "spleen"}}
    os.makedirs(src, exist_ok=True)
    json.dump(entries, open(src / "dataset.json", "w"))
    for sub, name in (("imagesTr", "amos_0001"), ("imagesTr", "amos_0500"),
                      ("imagesVa", "amos_0002"), ("imagesTs", "amos_0450")):
        _write_nii(str(src / sub / f"{name}.nii.gz"))
    _write_nii(str(src / "labelsTr" / "amos_0001.nii.gz"), dtype=np.uint8, value=0)
    _write_nii(str(src / "labelsTr" / "amos_0500.nii.gz"), dtype=np.uint8, value=0)
    _write_nii(str(src / "labelsVa" / "amos_0002.nii.gz"), dtype=np.uint8, value=0)
    from anatomask_tpu.dataset_conversion.convert_challenges import (
        convert_amos_task1, convert_amos_task2,
    )
    out = convert_amos_task1(str(src))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["numTraining"] == 2  # 0001 (train) + 0002 (val merged); 0500 is MRI
    assert dj["labels"] == {"background": 0, "spleen": 1}
    assert os.path.isfile(os.path.join(out, "imagesTr", "amos_0001_0000.nii.gz"))
    assert os.path.isfile(os.path.join(out, "imagesTr", "amos_0002_0000.nii.gz"))
    assert not os.path.isfile(os.path.join(out, "imagesTr", "amos_0500_0000.nii.gz"))
    # task2 takes everything
    out2 = convert_amos_task2(str(src))
    dj2 = json.load(open(os.path.join(out2, "dataset.json")))
    assert dj2["numTraining"] == 3
    assert os.path.isfile(os.path.join(out2, "imagesTr", "amos_0500_0000.nii.gz"))


def test_autopet_patient_level_splits(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "autopet"
    for pat in ("PETCT_a", "PETCT_b"):
        for acq in ("acq1", "acq2"):
            _write_nii(str(src / pat / acq / "CTres.nii.gz"))
            _write_nii(str(src / pat / acq / "SUV.nii.gz"))
            _write_nii(str(src / pat / acq / "SEG.nii.gz"), dtype=np.uint8, value=0)
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_autopet
    out = convert_autopet(str(src))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["numTraining"] == 4
    assert os.path.isfile(os.path.join(out, "imagesTr", "PETCT_a_acq1_0001.nii.gz"))
    splits = json.load(open(os.path.join(
        pp, "Dataset221_AutoPETII_2023", "splits_final.json")))
    assert len(splits) == 5
    for s in splits:
        # acquisitions of one patient never straddle train/val
        pats_tr = {i.rsplit("_", 1)[0] for i in s["train"]}
        pats_val = {i.rsplit("_", 1)[0] for i in s["val"]}
        assert not pats_tr & pats_val


def test_mnms_frame_extraction(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "mnms"
    tdir = src / "Training" / "Labeled" / "P1"
    os.makedirs(tdir)
    from anatomask_tpu.imageio.nifti import read_nifti, write_nifti
    vol4d = np.random.RandomState(0).rand(4, 5, 6, 8).astype(np.float32)
    write_nifti(str(tdir / "P1_sa.nii.gz"), vol4d, spacing_xyz=(1, 1, 1))
    write_nifti(str(tdir / "P1_sa_gt.nii.gz"),
                (vol4d > 0.5).astype(np.uint8), spacing_xyz=(1, 1, 1))
    with open(src / "info.csv", "w") as f:
        f.write("External code,ED,ES,Vendor\nP1,1,5,A\n")
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_mnms
    out = convert_mnms(str(src), "info.csv")
    for fr in (1, 5):
        img = os.path.join(out, "imagesTr", f"P1_frame{fr:02d}_0000.nii.gz")
        assert os.path.isfile(img)
        data, _ = read_nifti(img)
        np.testing.assert_allclose(data, vol4d[..., fr], atol=1e-6)
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["labels"] == {"background": 0, "LVBP": 1, "LVM": 2, "RV": 3}


def test_emidec(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "emidec"
    for c in ("Case_P001", "Case_P002"):
        _write_nii(str(src / c / "Images" / f"{c}.nii.gz"))
        _write_nii(str(src / c / "Contours" / f"{c}.nii.gz"), dtype=np.uint8, value=2)
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_emidec
    out = convert_emidec(str(src), None)
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["numTraining"] == 2
    assert dj["labels"]["no_reflow"] == 4
    assert os.path.isfile(os.path.join(out, "imagesTr", "Case_P001_0000.nii.gz"))


def test_fluo_c3dh_tiff(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    from PIL import Image
    src = tmp_path / "fluo"
    for seq in ("01", "02"):
        os.makedirs(src / seq)
        os.makedirs(src / (seq + "_GT") / "SEG")
        for i in range(2):
            frames = [Image.fromarray(np.zeros((6, 7), np.uint16)) for _ in range(3)]
            frames[0].save(str(src / seq / f"t{i:03d}.tif"),
                           save_all=True, append_images=frames[1:])
            frames[0].save(str(src / (seq + "_GT") / "SEG" / f"man_seg{i:03d}.tif"),
                           save_all=True, append_images=frames[1:])
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_fluo_c3dh_a549_sim
    out = convert_fluo_c3dh_a549_sim(str(src))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["numTraining"] == 4
    assert dj["file_ending"] == ".tif"
    assert os.path.isfile(os.path.join(out, "imagesTr", "01_image_000_0000.tif"))
    assert json.load(open(os.path.join(out, "imagesTr", "01_image_000.json")))[
        "spacing"] == [1, 0.126, 0.126]
    splits = json.load(open(os.path.join(
        pp, "Dataset073_Fluo_C3DH_A549_SIM", "splits_final.json")))
    assert len(splits) == 2
    assert all(c.startswith("01_") for c in splits[0]["train"])


def test_road_segmentation_white_area_removal(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    from PIL import Image
    src = tmp_path / "roads"
    os.makedirs(src / "training" / "input")
    os.makedirs(src / "training" / "output")
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16, :16] = 255  # large pure-white (invalid) region
    seg = np.zeros((32, 32), np.uint8)
    seg[:, :] = 255  # road everywhere
    Image.fromarray(img).save(str(src / "training" / "input" / "case1.png"))
    Image.fromarray(seg).save(str(src / "training" / "output" / "case1.png"))
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_road_segmentation
    out = convert_road_segmentation(str(src))
    got = np.asarray(Image.open(os.path.join(out, "labelsTr", "case1.png")))
    assert got.max() == 1  # 255 -> 1
    assert got[:16, :16].max() == 0  # road removed in the white region
    assert got[20:, 20:].min() == 1  # kept elsewhere


def test_old_nnunet_conversion(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    src = tmp_path / "Task01_Old"
    _write_nii(str(src / "imagesTr" / "c1_0000.nii.gz"))
    _write_nii(str(src / "labelsTr" / "c1.nii.gz"), dtype=np.uint8, value=0)
    json.dump({
        "modality": {"0": "CT"},
        "labels": {"0": "background", "1": "organ"},
        "numTraining": 1, "numTest": 0, "training": [], "test": [],
        "tensorImageSize": "3D",
    }, open(src / "dataset.json", "w"))
    from anatomask_tpu.dataset_conversion.convert_challenges import convert_old_nnunet_dataset
    out = convert_old_nnunet_dataset(str(src), "Dataset901_Old")
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["channel_names"] == {"0": "CT"}
    assert dj["labels"] == {"background": 0, "organ": 1}
    assert "training" not in dj and "modality" not in dj
    assert os.path.isfile(os.path.join(out, "imagesTr", "c1_0000.nii.gz"))
    with pytest.raises(RuntimeError, match="already exists"):
        convert_old_nnunet_dataset(str(src), "Dataset901_Old")
