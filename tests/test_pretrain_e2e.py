"""End-to-end MIM pretraining (AnatoMask teacher-student + SparK random-mask)
on a synthetic dataset with a tiny encoder, plus the SSL->finetune weight
transfer contract."""
import os

import numpy as np
import pytest

from synthetic import make_synthetic_dataset, setup_env


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pretrain")
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset904_PT", num_cases=6, shape=(20, 22, 24))
    from anatomask_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from anatomask_tpu.planning.planner import ExperimentPlanner
    from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
    DatasetFingerprintExtractor("Dataset904_PT", num_processes=1).run()
    ExperimentPlanner("Dataset904_PT").plan_experiment()
    DefaultPreprocessor().run("Dataset904_PT", "3d_fullres", "ATKPlans", num_processes=1)
    return tmp_path


def _tiny_cfg(method):
    from anatomask_tpu.ssl.pretrain import PretrainConfig
    return PretrainConfig(
        method=method, model_size="S", patch_size=(16, 16, 16), batch_size=2,
        num_epochs=2, iters_per_epoch=2, compute_dtype="float32",
        encoder_dims=(4, 8, 8), encoder_depth=(1, 1, 1),
        decoder_width=8, num_workers=1, warmup_epochs=1,
    )


def test_anatomask_pretraining_runs(prepared):
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    t = PretrainTrainer("Dataset904_PT", _tiny_cfg("anatomask"))
    assert t.model.fmap == (4, 4, 4)
    history = t.run_pretraining()
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
    assert os.path.isfile(os.path.join(t.output_folder, "checkpoint_final.npz"))
    assert os.path.isfile(os.path.join(t.output_folder, "S_head_latest.npz"))
    # teacher differs from student after EMA updates but stays close
    import jax
    d = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
         for a, b in zip(jax.tree_util.tree_leaves(t.params),
                         jax.tree_util.tree_leaves(t.ema_params))]
    assert max(d) > 0  # EMA lags behind the student


def test_spark_pretraining_runs(prepared):
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    t = PretrainTrainer("Dataset904_PT", _tiny_cfg("spark"))
    history = t.run_pretraining()
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])


def test_pretrain_checkpoint_config_guard(prepared):
    """Loading a checkpoint into a mismatched architecture must fail
    (reference SparK.load_state_dict config verification)."""
    from dataclasses import replace
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    t = PretrainTrainer("Dataset904_PT", _tiny_cfg("anatomask"))
    t.get_dataloaders()
    t.initialize()
    t.save_checkpoint("cfg_test.npz")
    t2 = PretrainTrainer("Dataset904_PT", replace(_tiny_cfg("anatomask"), mask_ratio=0.75))
    t2.get_dataloaders()
    t2.initialize()
    with pytest.raises(AttributeError, match="config mismatch"):
        t2.load_checkpoint(os.path.join(t.output_folder, "cfg_test.npz"))
    t.loader_train.stop(); t.loader_val.stop()
    t2.loader_train.stop(); t2.loader_val.stop()


def test_ssl_weights_transfer_to_stunet(prepared):
    """The pretrain->finetune contract: encoder weights from the SparK
    checkpoint land in the STUNet encoder (reference load_stunet_ssl_weights)."""
    import jax
    import jax.numpy as jnp
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    from anatomask_tpu.training.checkpoint import (
        flatten_tree, load_checkpoint, transfer_ssl_encoder_weights,
    )
    from anatomask_tpu.models.stunet import STUNet

    t = PretrainTrainer("Dataset904_PT", _tiny_cfg("anatomask"))
    t.get_dataloaders()
    t.initialize()
    t.save_checkpoint("for_transfer.npz")
    t.loader_train.stop(); t.loader_val.stop()

    # STUNet whose encoder matches the pretrained head topology
    net = STUNet(1, 3, depth=(1, 1, 1), dims=(4, 8, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]] * 2,
                 conv_kernel_sizes=[[3, 3, 3]] * 3)
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 16, 1)))["params"]

    arrays, meta = load_checkpoint(os.path.join(t.output_folder, "for_transfer.npz"))
    ssl_encoder = arrays["network_weights"]["sparse_encoder"]
    new_params = transfer_ssl_encoder_weights(
        jax.tree_util.tree_map(np.asarray, params), ssl_encoder, verbose=False)

    flat_new = flatten_tree(new_params)
    flat_ssl = flatten_tree(ssl_encoder)
    n_hit = 0
    for k, v in flat_ssl.items():
        if "conv_blocks_context" in k and k in flat_new:
            np.testing.assert_array_equal(flat_new[k], v)
            n_hit += 1
    assert n_hit > 10  # encoder convs + norms transferred
    # decoder untouched
    flat_old = flatten_tree(jax.tree_util.tree_map(np.asarray, params))
    assert any(
        np.array_equal(flat_new[k], flat_old[k])
        for k in flat_new if "conv_blocks_localization" in k
    )


def test_pretrain_resume(prepared):
    """--continue resumes from checkpoint_latest at the saved epoch."""
    from dataclasses import replace
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    import jax

    cfg = replace(_tiny_cfg("anatomask"), num_epochs=1)
    t = PretrainTrainer("Dataset904_PT", cfg,
                        output_folder=None)
    t.output_folder = t.output_folder + "_resume"
    import os
    os.makedirs(t.output_folder, exist_ok=True)
    t.run_pretraining()
    # extend epochs and resume
    t2 = PretrainTrainer("Dataset904_PT", replace(cfg, num_epochs=2))
    t2.output_folder = t.output_folder
    history = t2.run_pretraining(continue_training=True)
    assert t2.current_epoch == 1  # resumed at epoch 1, ran the second epoch


def test_cli_pretrain_full_stunet_head(tmp_path):
    """The user-facing CLI path with the REAL STUNet-S head (5 stages, /16):
    plan+preprocess via CLI, then atk_pretrain."""
    raw, pp, res = setup_env(tmp_path)
    make_synthetic_dataset(raw, "Dataset942_CLI", num_cases=5, shape=(20, 22, 24))
    from anatomask_tpu.cli import plan_and_preprocess_entry, pretrain_entry
    plan_and_preprocess_entry(["-d", "942", "-c", "3d_fullres", "-np", "1"])
    pretrain_entry(["942", "-method", "anatomask", "-model", "S",
                    "-patch_size", "16", "16", "16", "-batch_size", "2",
                    "-epochs", "1", "-iters_per_epoch", "2",
                    "-compute_dtype", "float32"])
    out = os.path.join(res, "Dataset942_CLI", "pretrain_anatomask_S")
    assert os.path.isfile(os.path.join(out, "checkpoint_final.npz"))
    assert os.path.isfile(os.path.join(out, "S_head_latest.npz"))
    # the head's 5-stage encoder transfers into a full STUNet-S
    import jax, jax.numpy as jnp
    from anatomask_tpu.models.stunet import stunet_preset
    from anatomask_tpu.training.checkpoint import (
        flatten_tree, load_checkpoint, transfer_ssl_encoder_weights,
    )
    net = stunet_preset("small", 1, 2)
    params = jax.tree_util.tree_map(
        np.asarray,
        net.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 32, 1)))["params"])
    arrays, _ = load_checkpoint(os.path.join(out, "checkpoint_final.npz"))
    merged = transfer_ssl_encoder_weights(params, arrays["network_weights"]["sparse_encoder"])
    flat_ssl = flatten_tree(arrays["network_weights"]["sparse_encoder"])
    flat_m = flatten_tree(merged)
    hits = [k for k in flat_ssl
            if "conv_blocks_context" in k and k in flat_m
            and np.array_equal(flat_m[k], flat_ssl[k])]
    assert len(hits) >= 30  # all 5 encoder stages transferred


def test_anatomask_pretraining_with_grad_accum(prepared):
    """grad_accum_steps > 1 path (lax.scan accumulation) runs end-to-end.
    batch 16 on the 8-device mesh -> 2 microbatches of 8."""
    setup_env(prepared)  # re-point env: test_cli_* above moved it to its own tmp
    from dataclasses import replace
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    cfg = replace(_tiny_cfg("anatomask"), batch_size=16, grad_accum_steps=2,
                  num_epochs=1, iters_per_epoch=1)
    t = PretrainTrainer("Dataset904_PT", cfg)
    t.output_folder = t.output_folder + "_accum"
    os.makedirs(t.output_folder, exist_ok=True)
    history = t.run_pretraining()
    assert t.grad_accum_steps == 2
    assert np.isfinite(history["train_loss"][0])


def test_anatomask_chunked_scan_path(prepared, monkeypatch):
    """The chunked-scan training path (device cache + ATK_STEP_CHUNK>1) runs
    K steps per dispatch and produces finite losses; the per-iter fallback
    (ATK_STEP_CHUNK=1) also still works."""
    from anatomask_tpu.ssl.pretrain import PretrainTrainer
    monkeypatch.setenv("ATK_STEP_CHUNK", "2")
    t = PretrainTrainer("Dataset904_PT", _tiny_cfg("anatomask"))
    history = t.run_pretraining()
    assert t.device_cache is not None
    assert t._step_chunk == 2
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
    # step counter advanced by iters_per_epoch * epochs
    assert t.step_counter == 4

    monkeypatch.setenv("ATK_STEP_CHUNK", "1")
    t2 = PretrainTrainer("Dataset904_PT", _tiny_cfg("anatomask"))
    h2 = t2.run_pretraining()
    assert t2._step_chunk == 1
    assert all(np.isfinite(v) for v in h2["train_loss"])
