"""Supervised training through the HBM-resident device cache (round 4).

The cache carries seg channels next to the image channels (margin -1, the
reference's out-of-bounds seg pad, data_loader_3d.py:7-49) and the Trainer
slices patch+seg on device — the host only draws (slot, origin) pairs. Beyond
perf, this sidesteps the dev tunnel's H2D host-buffer leak (CLAUDE.md).
"""
import os

import numpy as np
import pytest

from synthetic import make_synthetic_dataset, setup_env


@pytest.fixture(scope="module")
def sup_cache_env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("supcache")
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset957_SupCache", num_cases=6,
                           shape=(22, 24, 26))

    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from anatomask_tpu.plans.plans_handler import load_json, save_json

    DatasetFingerprintExtractor("Dataset957_SupCache", num_processes=1).run()
    ExperimentPlanner("Dataset957_SupCache").plan_experiment()
    DefaultPreprocessor().run("Dataset957_SupCache", "3d_fullres", "ATKPlans",
                              num_processes=1)

    plans_file = os.path.join(pp, "Dataset957_SupCache", "ATKPlans.json")
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
    dataset_json = load_json(os.path.join(pp, "Dataset957_SupCache", "dataset.json"))
    return plans_file, dataset_json


def _make_trainer(plans_file, dataset_json, **cfg_overrides):
    from anatomask_tpu.training.trainer import Trainer, TrainerConfig
    base = dict(
        name="ATKTrainerSupCache",
        num_epochs=2, num_iterations_per_epoch=3,
        num_val_iterations_per_epoch=2, compute_dtype="float32",
        num_workers=1, save_every=1, initial_lr=1e-2,
    )
    base.update(cfg_overrides)
    cfg = TrainerConfig(**base)
    return Trainer(plans_file, "tiny", 0, dataset_json, cfg)


def test_cached_training_runs_and_is_finite(sup_cache_env):
    plans_file, dataset_json = sup_cache_env
    tr = _make_trainer(plans_file, dataset_json, device_cache=True,
                       device_cache_mb=64)
    tr.run_training()
    assert tr.device_cache_train is not None, "cache should be active"
    assert tr.device_cache_val is not None
    lg = tr.logger.logging
    assert len(lg["train_losses"]) == 2
    assert all(np.isfinite(v) for v in lg["train_losses"])
    assert all(np.isfinite(v) for v in lg["val_losses"])
    assert os.path.isfile(os.path.join(tr.output_folder, "checkpoint_final.npz"))


def test_cache_extract_seg_is_exact(sup_cache_env):
    """Device extraction returns EXACTLY the cached seg labels (incl. the -1
    margin) — no interpolation, no dtype corruption through bf16 storage."""
    import jax.numpy as jnp
    plans_file, dataset_json = sup_cache_env
    tr = _make_trainer(plans_file, dataset_json, name="ATKTrainerSupCacheEx",
                       device_cache=True, device_cache_mb=64,
                       compute_dtype="bfloat16")
    tr.initialize()
    tr.get_dataloaders()
    cache = tr.device_cache_train
    assert cache is not None and cache.include_seg
    host_cache = np.asarray(cache.cache, dtype=np.float32)
    nC = cache.num_data_channels
    for _ in range(4):
        slots, origins = cache.sample_batch()
        data, seg = tr._cache_extract_train(cache.cache, jnp.asarray(slots),
                                            jnp.asarray(origins))
        seg = np.asarray(seg)
        assert seg.dtype == np.int16
        for b, (s, o) in enumerate(zip(slots, origins)):
            ip = cache.initial_patch
            ref = host_cache[s, o[0]:o[0] + ip[0], o[1]:o[1] + ip[1],
                             o[2]:o[2] + ip[2], nC:]
            np.testing.assert_array_equal(seg[b], ref.astype(np.int16))
            # labels stay in the dataset's label set (plus the -1 pad)
            assert set(np.unique(seg[b])) <= {-1, 0, 1, 2}
    for c in (tr.device_cache_train, tr.device_cache_val):
        if c is not None:
            c.stop()


def test_cache_margin_fill_is_minus_one(sup_cache_env):
    plans_file, dataset_json = sup_cache_env
    tr = _make_trainer(plans_file, dataset_json, name="ATKTrainerSupCacheM",
                       device_cache=True, device_cache_mb=64)
    tr.initialize()
    tr.get_dataloaders()
    cache = tr.device_cache_train
    host_cache = np.asarray(cache.cache, dtype=np.float32)
    nC = cache.num_data_channels
    # corner voxel of every slot lies in the margin (slot = window + patch,
    # case window is centered)
    assert np.all(host_cache[:, 0, 0, 0, nC:] == -1.0)
    assert np.all(host_cache[:, 0, 0, 0, :nC] == 0.0)
    for c in (tr.device_cache_train, tr.device_cache_val):
        if c is not None:
            c.stop()


def test_cache_gated_off_for_benchmark_dummies(sup_cache_env):
    plans_file, dataset_json = sup_cache_env
    tr = _make_trainer(plans_file, dataset_json, name="ATKTrainerSupCacheB",
                       device_cache=True, benchmark_no_dataloading=True)
    tr.initialize()
    tr.get_dataloaders()
    assert tr.device_cache_train is None


def test_cache_auto_on_by_default_and_env_optout(sup_cache_env, monkeypatch):
    """Round-5 default (VERDICT r4 item 4): device_cache=None AUTO-enables the
    HBM case cache wherever the gate allows (mirrors pretrain); the host
    pipeline stays available via ATK_SUP_DEVICE_CACHE=0 or device_cache=False."""
    plans_file, dataset_json = sup_cache_env
    tr = _make_trainer(plans_file, dataset_json, name="ATKTrainerSupCacheD",
                       device_cache_mb=64)
    tr.initialize()
    tr.get_dataloaders()
    assert tr.device_cache_train is not None, "default must be the safe path"

    monkeypatch.setenv("ATK_SUP_DEVICE_CACHE", "0")
    tr2 = _make_trainer(plans_file, dataset_json, name="ATKTrainerSupCacheD0",
                        device_cache_mb=64)
    tr2.initialize()
    tr2.get_dataloaders()
    assert tr2.device_cache_train is None

    tr3 = _make_trainer(plans_file, dataset_json, name="ATKTrainerSupCacheD1",
                        device_cache=False)
    tr3.initialize()
    tr3.get_dataloaders()
    assert tr3.device_cache_train is None
