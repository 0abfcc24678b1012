import os

import numpy as np
import pytest

from anatomask_tpu.data.dataset import CaseDataset, unpack_dataset
from anatomask_tpu.data.sampler import PatchSampler
from anatomask_tpu.data.pipeline import PrefetchPipeline
from anatomask_tpu.preprocessing.preprocessor import save_properties


def _make_preprocessed(tmp_path, n_cases=3, shape=(20, 22, 24)):
    folder = str(tmp_path / "pp")
    os.makedirs(folder, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_cases):
        data = rng.rand(1, *shape).astype(np.float32)
        seg = np.zeros((1, *shape), dtype=np.int8)
        seg[0, 5:10, 5:10, 5:10] = 1
        seg[0, 12:15, 12:15, 12:15] = 2
        base = os.path.join(folder, f"case_{i:03d}")
        np.savez_compressed(base + ".npz", data=data, seg=seg)
        props = {
            "spacing": [1.0, 1.0, 1.0],
            "class_locations": {
                1: np.argwhere(seg == 1)[:50],
                2: np.argwhere(seg == 2)[:50],
            },
        }
        save_properties(props, base)
    return folder


def test_dataset_load_and_unpack(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    assert len(ds) == 3
    data, seg, props = ds.load_case("case_000")
    assert data.shape == (1, 20, 22, 24)
    assert "class_locations" in props
    unpack_dataset(folder, num_processes=1)
    assert os.path.isfile(os.path.join(folder, "case_000.npy"))
    data2, seg2, _ = ds.load_case("case_000")
    assert isinstance(data2, np.memmap)
    np.testing.assert_array_equal(np.asarray(data2), np.asarray(data))


def test_sampler_shapes_and_padding(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    sampler = PatchSampler(ds, batch_size=4, patch_size=(32, 32, 32),
                           oversample_foreground_percent=0.33, seed=0)
    batch = sampler.generate_batch()
    assert batch["data"].shape == (4, 32, 32, 32, 1)
    assert batch["seg"].shape == (4, 32, 32, 32, 1)
    # patch larger than volume -> padded with 0 (data) / -1 (seg)
    assert (batch["seg"] == -1).any()
    assert batch["data"].dtype == np.float32


def test_sampler_force_fg(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    sampler = PatchSampler(ds, batch_size=2, patch_size=(8, 8, 8),
                           oversample_foreground_percent=1.0, seed=0)
    for _ in range(5):
        batch = sampler.generate_batch()
        for b in range(2):
            assert (batch["seg"][b] > 0).any(), "forced-fg patch must contain foreground"


def test_sampler_oversample_last_fraction(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    sampler = PatchSampler(ds, batch_size=3, patch_size=(8, 8, 8),
                           oversample_foreground_percent=0.33, seed=0)
    # batch 3, 33% -> exactly the last sample is forced (reference round rule)
    assert not sampler._do_oversample(0)
    assert not sampler._do_oversample(1)
    assert sampler._do_oversample(2)


def test_prefetch_pipeline(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    sampler = PatchSampler(ds, batch_size=2, patch_size=(16, 16, 16), seed=0)
    pipe = PrefetchPipeline(sampler, num_workers=2, prefetch_depth=2)
    it = iter(pipe)
    batches = [next(it) for _ in range(5)]
    assert all(b["data"].shape == (2, 16, 16, 16, 1) for b in batches)
    pipe.stop()


def test_probabilistic_oversampling_statistics(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    sampler = PatchSampler(ds, batch_size=1, patch_size=(8, 8, 8),
                           oversample_foreground_percent=0.4,
                           probabilistic_oversampling=True, seed=0)
    hits = sum(sampler._do_oversample(0) for _ in range(2000))
    assert 0.33 < hits / 2000 < 0.47  # ~Bernoulli(0.4)


def test_cascade_corruption_changes_prev_stage(tmp_path):
    folder = _make_preprocessed(tmp_path)
    ds = CaseDataset(folder)
    sampler = PatchSampler(ds, batch_size=1, patch_size=(8, 8, 8), seed=0,
                           cascade_corruption=True, cascade_p_binary_op=1.0,
                           cascade_p_remove_component=1.0)
    prev = np.zeros((12, 12, 12), dtype=np.int16)
    prev[2:7, 2:7, 2:7] = 1
    prev[9:11, 9:11, 9:11] = 1  # small component
    out = sampler._corrupt_previous_stage(prev)
    assert not np.array_equal(out, prev)  # binary op applied
    assert set(np.unique(out)) <= {0, 1}


def test_case_shape_header_peek(tmp_path):
    """CaseDataset.case_shape reads only headers and matches the real data
    shape for both the unpacked .npy and the .npz-only forms."""
    import numpy as np
    from anatomask_tpu.data.dataset import CaseDataset
    import pickle
    d = np.random.rand(2, 5, 7, 9).astype(np.float32)
    s = np.zeros((1, 5, 7, 9), np.int8)
    np.savez(tmp_path / "case0.npz", data=d, seg=s)
    with open(tmp_path / "case0.pkl", "wb") as f:
        pickle.dump({}, f)
    ds = CaseDataset(str(tmp_path))
    assert tuple(ds.case_shape("case0")) == d.shape  # npz header path
    np.save(tmp_path / "case0.npy", d)
    assert tuple(ds.case_shape("case0")) == d.shape  # npy header path


def test_hard_synthetic_task_has_texture_only_contrast(tmp_path):
    """The round-4 hard accuracy task (probes/accuracy_loop.py ACC_HARD=1):
    4 fg classes + thin shell, class intensity MEANS overlap (no voxel-wise
    threshold solves it) while per-class texture spread differs."""
    from synthetic import make_hard_synthetic_dataset
    from anatomask_tpu.imageio.nifti import read_nifti
    ds, dsj = make_hard_synthetic_dataset(str(tmp_path), "Dataset957_HardT",
                                          num_cases=1, shape=(48, 50, 52),
                                          seed=5)
    seg, _ = read_nifti(os.path.join(ds, "labelsTr", "case_000.nii.gz"))
    img, _ = read_nifti(os.path.join(ds, "imagesTr", "case_000_0000.nii.gz"))
    labs = set(np.unique(seg))
    assert labs == {0, 1, 2, 3, 4}
    assert len(dsj["labels"]) == 5
    # every class present with nontrivial mass; the shell is thin (smallest)
    counts = {int(l): int((seg == l).sum()) for l in labs}
    assert all(c > 200 for c in counts.values())
    assert counts[4] < counts[0]
    # intensity means overlap across classes relative to in-class spread:
    # max mean gap < 1 std -> thresholding cannot separate any pair
    means = {l: float(img[seg == l].mean()) for l in labs}
    stds = {l: float(img[seg == l].std()) for l in labs}
    gap = max(means.values()) - min(means.values())
    assert gap < min(stds.values()), (means, stds)
