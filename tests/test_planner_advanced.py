"""Planner paths not covered by the small synthetic dataset: 3d_lowres +
cascade generation for large volumes, anisotropic target-spacing override and
transpose. Uses a fabricated fingerprint (the planner reads only
dataset_fingerprint.json + dataset.json)."""
import json
import os

import numpy as np
import pytest

from synthetic import setup_env


def _fabricate(pp, raw, name, spacings, shapes, n=20):
    os.makedirs(os.path.join(raw, name, "imagesTr"), exist_ok=True)
    ds = {
        "channel_names": {"0": "CT"},
        "labels": {"background": 0, "organ": 1},
        "numTraining": n,
        "file_ending": ".nii.gz",
    }
    with open(os.path.join(raw, name, "dataset.json"), "w") as f:
        json.dump(ds, f)
    os.makedirs(os.path.join(pp, name), exist_ok=True)
    fp = {
        "spacings": [list(s) for s in spacings],
        "shapes_after_crop": [list(s) for s in shapes],
        "foreground_intensity_properties_per_channel": {
            "0": {"mean": 100.0, "median": 100.0, "std": 50.0, "min": -100.0,
                  "max": 500.0, "percentile_99_5": 400.0, "percentile_00_5": -50.0}},
        "median_relative_size_after_cropping": 0.7,
    }
    with open(os.path.join(pp, name, "dataset_fingerprint.json"), "w") as f:
        json.dump(fp, f)


def test_lowres_and_cascade_generated_for_large_volumes(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    name = "Dataset930_Big"
    # large isotropic CT volumes: fullres patch covers << 25% of median shape
    _fabricate(pp, raw, name,
               spacings=[[1.0, 1.0, 1.0]] * 20,
               shapes=[[512, 512, 512]] * 20)
    from anatomask_tpu.planning.planner import ExperimentPlanner
    plans = ExperimentPlanner(name).plan_experiment()
    assert "3d_lowres" in plans["configurations"]
    assert "3d_cascade_fullres" in plans["configurations"]
    assert plans["configurations"]["3d_lowres"]["next_stage"] == "3d_cascade_fullres"
    casc = plans["configurations"]["3d_cascade_fullres"]
    assert casc["previous_stage"] == "3d_lowres"
    assert casc["inherits_from"] == "3d_fullres"
    # lowres trades resolution for coverage
    lowres = plans["configurations"]["3d_lowres"]
    fullres = plans["configurations"]["3d_fullres"]
    assert all(l >= f for l, f in zip(lowres["spacing"], fullres["spacing"]))
    assert lowres["batch_dice"] is False and fullres["batch_dice"] is True
    # resolvable via PlansManager inheritance
    from anatomask_tpu.plans.plans_handler import PlansManager
    cm = PlansManager(plans).get_configuration("3d_cascade_fullres")
    assert cm.previous_stage_name == "3d_lowres"
    assert cm.patch_size == fullres["patch_size"]


def test_anisotropic_spacing_override_and_transpose(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    name = "Dataset931_Aniso"
    # thick-slice axis 2: spacing 6mm vs 0.7mm in-plane, few slices
    spacings = [[0.7, 0.7, 6.0]] * 20
    shapes = [[512, 512, 40]] * 20
    _fabricate(pp, raw, name, spacings, shapes)
    from anatomask_tpu.planning.planner import ExperimentPlanner
    planner = ExperimentPlanner(name)
    target = planner.determine_fullres_target_spacing()
    # anisotropy override: target spacing of the worst axis = 10th percentile
    assert target[2] == pytest.approx(6.0)  # all equal -> percentile = 6.0
    tf, tb = planner.determine_transpose()
    assert tf[0] == 2  # aniso axis moved first
    assert [tf[i] for i in tb] == [0, 1, 2]  # inverse permutation
    plans = planner.plan_experiment()
    cfg = plans["configurations"]["3d_fullres"]
    # patch padded to pooling divisibility per axis
    for ps, npool in zip(cfg["patch_size"], cfg["num_pool_per_axis"]):
        assert ps % (2 ** npool) == 0
    # thick axis pools less than in-plane axes
    assert cfg["num_pool_per_axis"][0] < cfg["num_pool_per_axis"][1]
    # first-stage conv kernel is 1 along the thick axis
    assert cfg["conv_kernel_sizes"][0][0] == 1


def test_memory_target_scales_patch(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    name = "Dataset932_Mem"
    _fabricate(pp, raw, name, [[1.0, 1.0, 1.0]] * 20, [[256, 256, 256]] * 20)
    from anatomask_tpu.planning.planner import ExperimentPlanner
    small = ExperimentPlanner(name, memory_target_gb=4.0).plan_experiment()
    # replan with a larger budget under a different plans name
    big = ExperimentPlanner(name, memory_target_gb=16.0, plans_name="ATKPlansBig").plan_experiment()
    vox_small = np.prod(small["configurations"]["3d_fullres"]["patch_size"]) * \
        small["configurations"]["3d_fullres"]["batch_size"]
    vox_big = np.prod(big["configurations"]["3d_fullres"]["patch_size"]) * \
        big["configurations"]["3d_fullres"]["batch_size"]
    assert vox_big > vox_small
