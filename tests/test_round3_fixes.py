"""Round-3 advisor fixes + tooling-tail coverage.

- Decathlon-style results collector + pivot summarizer
  (reference /root/reference/nnunetv2/batch_running/collect_results_custom_Decathlon.py)
- named Xepochs_NoMirroring presets
  (reference variants/training_length/nnUNetTrainer_Xepochs_NoMirroring.py)
- SitkLikeIO extensionless-filename error (ADVICE r2)
- MINC2 dimorder-missing inference (ADVICE r2)
- background checkpoint writer surfaces write failures (ADVICE r2)
- per-label seg warp border cval=-1 (ADVICE r2, reference border_cval_seg=-1)
"""
import json
import os

import numpy as np
import pytest


def _write_summary(path, dice):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"foreground_mean": {"Dice": dice}}, f)


def test_collect_and_summarize_results(tmp_path, monkeypatch):
    from anatomask_tpu import paths
    from anatomask_tpu.utils.batch_running import (collect_results,
                                                   summarize_collected_results)
    res = tmp_path / "results"
    monkeypatch.setenv("ATK_results", str(res))
    paths.refresh()
    name = "Dataset009_Spleen"
    model = "ATKTrainer__ATKPlans__3d_fullres"
    for fl, dice in [(0, 0.8), (1, 0.9)]:  # fold 2 missing
        _write_summary(str(res / name / model / f"fold_{fl}" / "validation" /
                           "summary.json"), dice)
    csv = tmp_path / "collected.csv"
    collect_results({"ATKTrainer": ("ATKPlans",)}, [name], str(csv),
                    configurations=("3d_fullres",), folds=(0, 1, 2))
    rows = [ln.strip().split(",") for ln in open(csv)]
    assert len(rows) == 1
    r = rows[0]
    assert r[0] == name and r[1] == "3d_fullres" and r[2] == "ATKTrainer"
    assert float(r[5]) == pytest.approx(0.8) and float(r[6]) == pytest.approx(0.9)
    assert r[7] == ""  # missing fold -> empty cell
    assert float(r[8]) == pytest.approx(0.85)  # nanmean over present folds

    # pivot over the two complete folds
    out = tmp_path / "summary.csv"
    summarize_collected_results(str(csv), str(out), folds=(0, 1),
                                configs=("3d_fullres",), datasets=[name],
                                trainers={"ATKTrainer": ("ATKPlans",)})
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "name,9_3d_f,mean"
    cells = lines[1].split(",")
    assert cells[0] == "ATKTrainer__ATKPlans"
    assert float(cells[1]) == pytest.approx(0.85)
    assert float(cells[2]) == pytest.approx(0.85)

    # asking for the missing fold yields nan
    out2 = tmp_path / "summary2.csv"
    summarize_collected_results(str(csv), str(out2), folds=(0, 1, 2),
                                configs=("3d_fullres",), datasets=[name],
                                trainers={"ATKTrainer": ("ATKPlans",)})
    assert "nan" in open(out2).read().splitlines()[1]


def test_wrap_commands_for_scheduler():
    """LSF bsub emission shape matches the reference generator
    (generate_lsf_runs_customDecathlon.py:82-85); slurm + none variants."""
    from anatomask_tpu.utils.batch_running import (
        generate_training_commands, wrap_commands_for_scheduler)
    cmds = generate_training_commands([137], ("3d_fullres",), folds=(0,),
                                      extra_args="--disable_checkpointing")
    assert cmds == ["atk_train 137 3d_fullres 0 -tr ATKTrainer -p ATKPlans "
                    "--disable_checkpointing"]
    lsf = wrap_commands_for_scheduler(
        cmds, "lsf", scheduler_args='-q gpu-lowprio -gpu num=1',
        preamble="source ~/env.sh && ")
    assert lsf == ['bsub -q gpu-lowprio -gpu num=1 -L /bin/bash '
                   "'source ~/env.sh && " + cmds[0] + "'"]
    slurm = wrap_commands_for_scheduler(cmds, "slurm", "--gres=tpu:1")
    assert slurm == ["sbatch --gres=tpu:1 --wrap '" + cmds[0] + "'"]
    assert wrap_commands_for_scheduler(cmds, "none") == cmds
    # embedded double quote must survive intact (advisor, round 4)
    import shlex
    tricky = 'atk_train 1 2d 0 -extra "a b"'
    wrapped = wrap_commands_for_scheduler([tricky], "lsf")[0]
    assert shlex.split(wrapped)[-1] == tricky
    with pytest.raises(ValueError):
        wrap_commands_for_scheduler(cmds, "pbs")


def test_xepochs_nomirroring_presets():
    from anatomask_tpu.training.trainer import get_trainer_config
    for n in (250, 2000, 4000, 8000):
        cfg = get_trainer_config(f"ATKTrainer_{n}epochs_NoMirroring")
        assert cfg.num_epochs == n
        assert cfg.do_mirroring_aug is False


def test_sitklike_io_no_extension_error():
    from anatomask_tpu.imageio.registry import SitkLikeIO
    with pytest.raises(RuntimeError, match="no extension"):
        SitkLikeIO._impl("/some/dir/filename_without_ending")


def test_minc_dimorder_guess(tmp_path):
    h5py = pytest.importorskip("h5py")
    from anatomask_tpu.imageio.minc_io import read_minc
    # distinct lengths, no dimorder attr, stored z,y,x
    vol = np.random.RandomState(0).rand(5, 6, 7).astype(np.float32)
    p = str(tmp_path / "x.mnc")
    with h5py.File(p, "w") as f:
        root = f.create_group("minc-2.0")
        img = root.create_group("image/0")
        img.create_dataset("image", data=vol)
        for name, length in (("zspace", 5), ("yspace", 6), ("xspace", 7)):
            g = root.create_group(f"dimensions/{name}")
            g.attrs["length"] = length
            g.attrs["step"] = 1.0
            g.attrs["start"] = 0.0
    with pytest.warns(UserWarning, match="guessing"):
        data, meta = read_minc(p)
    # reader returns x,y,z order
    assert data.shape == (7, 6, 5)
    np.testing.assert_allclose(data, vol.transpose(2, 1, 0))


def test_ckpt_writer_error_surfaces(tmp_path):
    """A failed background checkpoint write must raise at the next join, not
    vanish (ADVICE r2: pretrain.py:473 / trainer.py:716)."""
    from anatomask_tpu.ssl.pretrain import PretrainTrainer

    class Host:
        output_folder = str(tmp_path / "nonexistent_dir_no_mkdir" / "deep")
        _join_ckpt_writer = PretrainTrainer._join_ckpt_writer
        _write_checkpoints_async = PretrainTrainer._write_checkpoints_async

        def print_to_log_file(self, *a, **k):
            pass

    h = Host()
    h._write_checkpoints_async([("latest.npz", {"a": np.zeros(3)}, {})])
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        h._join_ckpt_writer()
    # error is cleared after being raised once
    h._join_ckpt_writer()


def test_seg_warp_border_cval():
    """Indicator warp uses cval=-1 so out-of-bounds samples can't reach the
    0.5 threshold (reference border_cval_seg=-1, nnUNetTrainer.py:689-690):
    a label filling the whole source must NOT bleed past the border midpoint."""
    import jax.numpy as jnp
    from anatomask_tpu.data.augment import _seg_per_label_sample
    vol = jnp.ones((4, 4, 4), jnp.float32)  # label 1 everywhere
    # sample at x=-0.4: linear weight of in-bounds voxel is 0.6, but the
    # out-of-bounds neighbor contributes cval=-1*0.4 -> 0.6-0.4=0.2 < 0.5
    pos = jnp.array([[-0.4], [1.0], [1.0]], jnp.float32).reshape(3, 1, 1, 1)
    out = np.asarray(_seg_per_label_sample(vol, pos, [1]))
    assert out.ravel()[0] == 0.0
    # well inside: label claimed
    pos_in = jnp.array([[1.2], [1.0], [1.0]], jnp.float32).reshape(3, 1, 1, 1)
    out_in = np.asarray(_seg_per_label_sample(vol, pos_in, [1]))
    assert out_in.ravel()[0] == 1.0
