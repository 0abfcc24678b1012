import os

import numpy as np
import pytest

from anatomask_tpu.planning.topology import get_pool_and_conv_props, pad_shape
from anatomask_tpu.planning.planner import ExperimentPlanner, estimate_conv_feature_map_voxels
from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
from anatomask_tpu.plans.plans_handler import PlansManager

from synthetic import make_synthetic_dataset, setup_env


def test_pad_shape():
    np.testing.assert_array_equal(pad_shape([30, 32, 17], [8, 8, 8]), [32, 32, 24])
    np.testing.assert_array_equal(pad_shape([32, 32, 32], 8), [32, 32, 32])


def test_topology_isotropic():
    npool, pools, convs, patch, must_div = get_pool_and_conv_props(
        [1.0, 1.0, 1.0], [128, 128, 128], 4, 999999
    )
    assert npool == [5, 5, 5]
    assert pools[0] == [1, 1, 1]
    assert all(p == [2, 2, 2] for p in pools[1:])
    assert len(convs) == len(pools)
    assert convs[-1] == [3, 3, 3]
    np.testing.assert_array_equal(patch, [128, 128, 128])
    np.testing.assert_array_equal(must_div, [32, 32, 32])


def test_topology_anisotropic():
    """Thick-slice axis pools less and starts with kernel size 1."""
    npool, pools, convs, patch, _ = get_pool_and_conv_props(
        [4.0, 1.0, 1.0], [40, 128, 128], 4, 999999
    )
    assert npool[0] < npool[1] == npool[2]
    assert convs[0][0] == 1  # coarse axis starts with kernel 1
    assert convs[-1] == [3, 3, 3]
    # in-plane axes pool first
    assert pools[1][0] == 1 and pools[1][1] == 2


def test_estimate_monotone_in_patch():
    common = dict(
        n_stages=5,
        strides=[[1, 1, 1]] + [[2, 2, 2]] * 4,
        num_input_channels=1,
        features_per_stage=[32, 64, 128, 256, 320],
        blocks_per_stage_encoder=[2] * 5,
        blocks_per_stage_decoder=[2] * 4,
        num_classes=3,
    )
    small = estimate_conv_feature_map_voxels(patch_size=[64, 64, 64], **common)
    large = estimate_conv_feature_map_voxels(patch_size=[128, 128, 128], **common)
    assert large > small * 6  # roughly 8x


def test_fingerprint_and_planner_end_to_end(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset901_Synth")
    fp = DatasetFingerprintExtractor("Dataset901_Synth", num_processes=1).run()
    assert len(fp["spacings"]) == 6
    assert "0" in fp["foreground_intensity_properties_per_channel"]
    stats = fp["foreground_intensity_properties_per_channel"]["0"]
    assert stats["min"] <= stats["percentile_00_5"] <= stats["median"] <= stats["percentile_99_5"] <= stats["max"]

    planner = ExperimentPlanner("Dataset901_Synth", memory_target_gb=8.0)
    plans = planner.plan_experiment()
    assert "3d_fullres" in plans["configurations"]
    assert "2d" in plans["configurations"]
    cfg = plans["configurations"]["3d_fullres"]
    # patch cannot exceed padded median shape; must be divisible by pooling
    for ps, npool in zip(cfg["patch_size"], cfg["num_pool_per_axis"]):
        assert ps % (2 ** npool) == 0
    assert cfg["batch_size"] >= 2
    assert cfg["normalization_schemes"] == ["CTNormalization"]

    # plans file loadable via PlansManager
    pm = PlansManager(os.path.join(pp, "Dataset901_Synth", "ATKPlans.json"))
    cm = pm.get_configuration("3d_fullres")
    assert cm.batch_dice in (True, False)
    assert os.path.isfile(os.path.join(pp, "Dataset901_Synth", "dataset.json"))


def test_preprocess_end_to_end(tmp_path):
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset902_Synth", num_cases=3)
    DatasetFingerprintExtractor("Dataset902_Synth", num_processes=1).run()
    ExperimentPlanner("Dataset902_Synth").plan_experiment()

    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor, load_properties
    out_dir = DefaultPreprocessor().run("Dataset902_Synth", "3d_fullres", "ATKPlans", num_processes=1)
    files = sorted(os.listdir(out_dir))
    npz = [f for f in files if f.endswith(".npz") and not f.endswith(".props.npz")]
    assert len(npz) == 3
    with np.load(os.path.join(out_dir, npz[0])) as z:
        data, seg = z["data"], z["seg"]
    assert data.ndim == 4 and seg.ndim == 4
    assert seg.dtype in (np.int8, np.int16)
    props = load_properties(os.path.join(out_dir, npz[0][:-4]))
    assert "class_locations" in props
    assert "bbox_used_for_cropping" in props
    # class locations index into seg and hit the right label
    for k, locs in props["class_locations"].items():
        if isinstance(k, tuple) or len(np.atleast_1d(locs)) == 0:
            continue
        locs = np.asarray(locs)
        vals = seg[tuple(locs.T)]
        assert (vals == k).all()
