import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from anatomask_tpu.preprocessing.cropping import crop_to_nonzero, create_nonzero_mask
from anatomask_tpu.preprocessing.normalization import (
    CTNormalization,
    ZScoreNormalization,
    get_normalization_scheme,
)
from anatomask_tpu.preprocessing.resampling import (
    compute_new_shape,
    get_do_separate_z,
    get_lowres_axis,
    resample_data_or_seg_to_shape,
)


def test_crop_to_nonzero(rng):
    data = np.zeros((1, 10, 12, 14), dtype=np.float32)
    data[0, 2:8, 3:9, 4:10] = rng.rand(6, 6, 6) + 0.5
    seg = np.zeros((1, 10, 12, 14), dtype=np.int8)
    seg[0, 4:6, 4:6, 5:7] = 1
    cd, cs, bbox = crop_to_nonzero(data, seg)
    assert bbox == [[2, 8], [3, 9], [4, 10]]
    assert cd.shape == (1, 6, 6, 6)
    # outside-mask background voxels -> -1 (here the whole crop is nonzero)
    assert cs.min() >= -1
    assert (cs == 1).sum() == 8


def test_crop_marks_outside_as_minus_one():
    data = np.zeros((1, 6, 6, 6), dtype=np.float32)
    data[0, 1:5, 1:5, 1:5] = 1.0
    data[0, 1, 1, 1] = 0.0  # a zero voxel inside bbox but... filled by fill_holes? no, corner
    seg = np.zeros((1, 6, 6, 6), dtype=np.int8)
    _, cs, bbox = crop_to_nonzero(data, seg)
    assert bbox == [[1, 5], [1, 5], [1, 5]]
    # corner voxel is outside nonzero mask -> -1
    assert cs[0, 0, 0, 0] == -1


def test_zscore_normalization(rng):
    img = rng.rand(8, 8, 8).astype(np.float32) * 10
    out = ZScoreNormalization(use_mask_for_norm=False).run(img.copy())
    assert abs(out.mean()) < 1e-4 and abs(out.std() - 1) < 1e-4

    seg = np.full((8, 8, 8), -1, dtype=np.int8)
    seg[2:6] = 0
    out = ZScoreNormalization(use_mask_for_norm=True).run(img.copy(), seg)
    inside = out[2:6]
    assert abs(inside.mean()) < 1e-4
    np.testing.assert_array_equal(out[0], img[0])  # untouched outside mask


def test_ct_normalization(rng):
    img = rng.rand(8, 8, 8).astype(np.float32) * 1000 - 200
    props = {"mean": 100.0, "std": 50.0, "percentile_00_5": 0.0, "percentile_99_5": 500.0}
    out = CTNormalization(intensityproperties=props).run(img.copy())
    expected = (np.clip(img, 0, 500) - 100.0) / 50.0
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_compute_new_shape():
    np.testing.assert_array_equal(
        compute_new_shape([100, 100, 50], [1.0, 1.0, 2.0], [0.5, 0.5, 1.0]), [200, 200, 100]
    )


def test_separate_z_detection():
    assert get_do_separate_z([1.0, 1.0, 4.0])
    assert not get_do_separate_z([1.0, 1.0, 2.0])
    np.testing.assert_array_equal(get_lowres_axis([1.0, 1.0, 4.0]), [2])


def test_resample_matches_dense_spline(rng):
    """Our separable-matrix resize must equal dense map_coordinates evaluation."""
    data = rng.rand(1, 9, 10, 11).astype(np.float32)
    new_shape = (14, 7, 17)
    out = resample_data_or_seg_to_shape(
        data, new_shape, [1.0, 1.0, 1.0], [9 / 14, 10 / 7, 11 / 17],
        is_seg=False, order=3, force_separate_z=False,
    )
    # dense reference: skimage-style coordinate map
    scale = [o / n for o, n in zip(data.shape[1:], new_shape)]
    grids = np.meshgrid(*[(np.arange(n) + 0.5) * s - 0.5 for n, s in zip(new_shape, scale)],
                        indexing="ij")
    dense = map_coordinates(data[0].astype(np.float64), np.array(grids), order=3, mode="nearest")
    np.testing.assert_allclose(out[0], dense, atol=1e-4)


def test_resample_seg_labels_preserved(rng):
    seg = np.zeros((1, 12, 12, 12), dtype=np.int8)
    seg[0, 3:9, 3:9, 3:9] = 2
    seg[0, 5:7, 5:7, 5:7] = 1
    out = resample_data_or_seg_to_shape(
        seg, (18, 18, 18), [1.0, 1.0, 1.0], [2 / 3] * 3, is_seg=True, order=1,
        force_separate_z=False,
    )
    assert set(np.unique(out).tolist()) <= {0, 1, 2}
    assert out.dtype == seg.dtype
    # structure grossly preserved
    assert out[0, 9, 9, 9] == 1
    assert out[0, 6, 6, 6] == 2
    assert out[0, 0, 0, 0] == 0


def test_resample_separate_z(rng):
    data = rng.rand(1, 8, 8, 4).astype(np.float32)
    out = resample_data_or_seg_to_shape(
        data, (16, 16, 8), [1.0, 1.0, 4.0], [0.5, 0.5, 2.0],
        is_seg=False, order=3, order_z=0, force_separate_z=None,
    )
    assert out.shape == (1, 16, 16, 8)
    # order-0 along z: output slices are copies of nearest input slices
    # z coords: (i+0.5)*0.5-0.5 -> nearest of [-0.25, 0.25, ...] -> [0,0,1,1,2,2,3,3]
    inplane = resample_data_or_seg_to_shape(
        data, (16, 16, 4), [1.0, 1.0, 1.0], [0.5, 0.5, 1.0], is_seg=False, order=3,
        force_separate_z=False,
    )
    np.testing.assert_allclose(out[0, :, :, 2], inplane[0, :, :, 1], atol=1e-5)


def test_noop_resample_returns_input(rng):
    data = rng.rand(1, 5, 5, 5).astype(np.float32)
    out = resample_data_or_seg_to_shape(data, (5, 5, 5), [1, 1, 1], [1, 1, 1])
    np.testing.assert_array_equal(out, data)
