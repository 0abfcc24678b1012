import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomask_tpu.data.augment import (
    AugmentConfig,
    IntensityAugmentConfig,
    SpatialAugmentConfig,
    compute_initial_patch_size,
    downsample_seg_for_ds,
    gaussian_blur,
    gaussian_noise,
    contrast,
    brightness_multiplicative,
    make_train_augment_fn,
    make_val_transform_fn,
    mirror,
    rotation_ranges_and_initial_patch_size,
    simulate_lowres,
    spatial_augment,
    _gamma_once,
)


def _identity_spatial(patch):
    return SpatialAugmentConfig(
        patch_size=tuple(patch), p_rotation=0.0, p_scaling=0.0,
    )


def test_initial_patch_size_enlarged():
    size = compute_initial_patch_size([64, 64, 64], (-np.pi / 6, np.pi / 6),
                                      (-np.pi / 6, np.pi / 6), (-np.pi / 6, np.pi / 6),
                                      (0.85, 1.25))
    assert all(s > 64 for s in size)


def test_rotation_config_isotropic_vs_aniso():
    rot, dummy, initial, mirror_axes = rotation_ranges_and_initial_patch_size([64, 64, 64])
    assert not dummy and mirror_axes == (0, 1, 2)
    rot, dummy, initial, _ = rotation_ranges_and_initial_patch_size([16, 64, 64])
    assert dummy
    assert initial[0] == 16  # axis 0 not enlarged in dummy-2D


def test_spatial_identity_is_center_crop(rng):
    data = rng.rand(2, 12, 12, 12, 1).astype(np.float32)
    seg = rng.randint(0, 3, (2, 12, 12, 12, 1)).astype(np.int16)
    cfg = _identity_spatial((8, 8, 8))
    d, s = spatial_augment(jnp.array(data), jnp.array(seg), jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(d), data[:, 2:10, 2:10, 2:10], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s), seg[:, 2:10, 2:10, 2:10])


def test_spatial_rotation_changes_but_preserves_range(rng):
    data = rng.rand(1, 16, 16, 16, 1).astype(np.float32)
    seg = rng.randint(0, 4, (1, 16, 16, 16, 1)).astype(np.int16)
    cfg = SpatialAugmentConfig(patch_size=(8, 8, 8), p_rotation=1.0, p_scaling=1.0,
                               data_interpolation_order=1)
    d, s = spatial_augment(jnp.array(data), jnp.array(seg), jax.random.PRNGKey(42), cfg)
    assert d.shape == (1, 8, 8, 8, 1)
    assert float(d.min()) >= -1e-5 and float(d.max()) <= 1.0 + 1e-5  # interp stays in hull
    assert set(np.unique(np.asarray(s))) <= {-1, 0, 1, 2, 3}  # nearest keeps labels


def test_cubic_sample_matches_scipy_order3(rng):
    """Reference SpatialTransform uses order_data=3; our shipped default is
    order 1 (trilinear) for TPU cost reasons with order 3 selectable via
    SpatialAugmentConfig.data_interpolation_order — see PARITY.md. This test
    checks the order-3 path: the on-device cubic B-spline sampler matches
    scipy map_coordinates(order=3) away from the boundary (the FIR prefilter
    truncation is ~1e-7; boundary handling differs in the reflected prefilter
    region)."""
    from scipy.ndimage import map_coordinates
    from anatomask_tpu.data.augment import _cubic_sample
    vol = rng.rand(20, 19, 18).astype(np.float32)
    pts = rng.uniform(5, 12, size=(3, 7, 7, 7)).astype(np.float32)
    got = np.asarray(_cubic_sample(jnp.array(vol), jnp.array(pts), 0.0))
    expect = map_coordinates(vol, pts.reshape(3, -1), order=3,
                             mode="constant", cval=0.0).reshape(7, 7, 7)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_seg_per_label_linear_matches_reference(rng):
    """order_seg=1 parity: per-label linear indicator warp + 0.5 threshold,
    later labels overwrite (batchgenerators interpolate_img is_seg path)."""
    from scipy.ndimage import map_coordinates
    from anatomask_tpu.data.augment import _seg_per_label_sample
    seg = rng.randint(-1, 3, (14, 14, 14)).astype(np.float32)
    pts = rng.uniform(1, 12, size=(3, 6, 6, 6)).astype(np.float32)
    labels = (-1, 0, 1, 2)
    got = np.asarray(_seg_per_label_sample(jnp.array(seg), jnp.array(pts), labels))
    expect = np.zeros((6, 6, 6), np.float32)
    for cl in sorted(labels):
        ind = (seg == cl).astype(np.float32)
        r = map_coordinates(ind, pts.reshape(3, -1), order=1,
                            mode="constant", cval=0.0).reshape(6, 6, 6)
        expect[r >= 0.5] = cl
    np.testing.assert_array_equal(got, expect)


def test_cubic_identity_at_integer_coords(rng):
    from anatomask_tpu.data.augment import _cubic_sample
    vol = rng.rand(16, 16, 16).astype(np.float32)
    ii, jj, kk = np.meshgrid(np.arange(4, 12), np.arange(4, 12),
                             np.arange(4, 12), indexing="ij")
    pts = np.stack([ii, jj, kk]).astype(np.float32)
    got = np.asarray(_cubic_sample(jnp.array(vol), jnp.array(pts), 0.0))
    np.testing.assert_allclose(got, vol[4:12, 4:12, 4:12], rtol=1e-4, atol=1e-4)


def test_noise_changes_data(rng):
    x = jnp.array(rng.rand(2, 8, 8, 8, 1).astype(np.float32))
    cfg = IntensityAugmentConfig(p_noise=1.0)
    out = gaussian_noise(x, jax.random.PRNGKey(0), cfg)
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_blur_reduces_variance(rng):
    x = jnp.array(rng.rand(1, 12, 12, 12, 1).astype(np.float32))
    cfg = IntensityAugmentConfig(p_blur=1.0, p_blur_per_channel=1.0, blur_sigma=(1.0, 1.0))
    out = gaussian_blur(x, jax.random.PRNGKey(0), cfg)
    assert float(jnp.var(out)) < float(jnp.var(x))
    assert float(jnp.mean(out)) == pytest.approx(float(jnp.mean(x)), rel=0.05)


def test_brightness_scales(rng):
    x = jnp.array(rng.rand(1, 4, 4, 4, 2).astype(np.float32)) + 1
    cfg = IntensityAugmentConfig(p_brightness=1.0, brightness_range=(2.0, 2.0))
    out = brightness_multiplicative(x, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x), rtol=1e-5)


def test_contrast_preserves_mean(rng):
    x = jnp.array(rng.rand(1, 8, 8, 8, 1).astype(np.float32))
    cfg = IntensityAugmentConfig(p_contrast=1.0, contrast_range=(0.5, 0.5))
    out = contrast(x, jax.random.PRNGKey(0), cfg)
    assert float(out.mean()) == pytest.approx(float(x.mean()), rel=1e-3)
    assert float(out.std()) < float(x.std())


def test_lowres_blockiness(rng):
    x = jnp.array(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
    cfg = IntensityAugmentConfig(p_lowres=1.0, p_lowres_per_channel=1.0, lowres_zoom=(0.5, 0.5))
    out = simulate_lowres(x, jax.random.PRNGKey(0), cfg)
    # fewer distinct effective samples along each axis -> reduced variation
    d_orig = np.abs(np.diff(np.asarray(x)[0, :, 0, 0, 0])).sum()
    d_low = np.abs(np.diff(np.asarray(out)[0, :, 0, 0, 0])).sum()
    assert d_low < d_orig


def test_gamma_retain_stats(rng):
    x = jnp.array(rng.rand(1, 8, 8, 8, 1).astype(np.float32) * 3 - 1)
    out = _gamma_once(x, jax.random.PRNGKey(3), 1.0, False, IntensityAugmentConfig())
    assert float(out.mean()) == pytest.approx(float(x.mean()), abs=1e-3)
    assert float(out.std()) == pytest.approx(float(x.std()), rel=1e-3)
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_mirror_involution(rng):
    data = jnp.array(rng.rand(4, 6, 6, 6, 1).astype(np.float32))
    seg = jnp.array(rng.randint(0, 2, (4, 6, 6, 6, 1)).astype(np.int16))
    d, s = mirror(data, seg, jax.random.PRNGKey(0), (0, 1, 2))
    # values preserved as multisets per sample
    for b in range(4):
        np.testing.assert_allclose(
            np.sort(np.asarray(d[b]).ravel()), np.sort(np.asarray(data[b]).ravel()), atol=0
        )


def test_ds_pyramid_shapes():
    seg = jnp.zeros((2, 16, 16, 8, 1), jnp.int16)
    outs = downsample_seg_for_ds(seg, [(1, 1, 1), (2, 2, 2), (4, 4, 2)])
    assert outs[0].shape == (2, 16, 16, 8, 1)
    assert outs[1].shape == (2, 8, 8, 4, 1)
    assert outs[2].shape == (2, 4, 4, 4, 1)


def test_full_train_pipeline(rng):
    cfg = AugmentConfig(
        spatial=SpatialAugmentConfig(patch_size=(8, 8, 8)),
        mirror_axes=(0, 1, 2),
        mask_channels_for_norm=(0,),
        ds_scales=((1, 1, 1), (2, 2, 2)),
    )
    fn = jax.jit(make_train_augment_fn(cfg))
    data = jnp.array(rng.rand(2, 12, 12, 12, 1).astype(np.float32))
    seg = jnp.array(rng.randint(-1, 3, (2, 12, 12, 12, 1)).astype(np.int16))
    d, targets = fn(jax.random.PRNGKey(0), data, seg)
    assert d.shape == (2, 8, 8, 8, 1)
    assert len(targets) == 2
    assert targets[0].shape == (2, 8, 8, 8, 1)
    assert targets[1].shape == (2, 4, 4, 4, 1)
    assert int(jnp.min(targets[0])) >= 0  # -1 removed


def test_val_pipeline(rng):
    cfg = AugmentConfig(spatial=_identity_spatial((8, 8, 8)), ds_scales=((1, 1, 1),))
    fn = make_val_transform_fn(cfg)
    data = jnp.array(rng.rand(1, 8, 8, 8, 1).astype(np.float32))
    seg = jnp.full((1, 8, 8, 8, 1), -1, jnp.int16)
    d, targets = fn(None, data, seg)
    assert int(targets[0].max()) == 0


def test_elastic_deformation(rng):
    cfg = SpatialAugmentConfig(patch_size=(8, 8, 8), p_rotation=0.0, p_scaling=0.0,
                               p_elastic=1.0, elastic_magnitude=(0.1, 0.1),
                               data_interpolation_order=1)  # hull check needs linear
    data = rng.rand(1, 12, 12, 12, 1).astype(np.float32)
    seg = rng.randint(0, 3, (1, 12, 12, 12, 1)).astype(np.int16)
    d, s = spatial_augment(jnp.array(data), jnp.array(seg), jax.random.PRNGKey(0), cfg)
    center_crop = data[:, 2:10, 2:10, 2:10]
    assert not np.allclose(np.asarray(d), center_crop)  # deformed
    assert float(d.min()) >= -1e-5 and float(d.max()) <= 1 + 1e-5


# --- DA5 aggressive stack (reference nnUNetTrainerDA5) -------------------------

def test_da5_extras_shapes_and_finiteness():
    import jax, jax.numpy as jnp
    from anatomask_tpu.data.augment_da5 import DA5Config, apply_da5_extras
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 12, 12, 12, 2), jnp.float32)
    seg = jnp.asarray(rng.randint(0, 3, (2, 12, 12, 12, 1)), jnp.int16)
    cfg = DA5Config()
    fn = jax.jit(lambda k, d, s: apply_da5_extras(k, d, s, (12, 12, 12), cfg))
    d2, s2 = fn(jax.random.PRNGKey(0), x, seg)
    assert d2.shape == x.shape and s2.shape == seg.shape
    assert np.isfinite(np.asarray(d2)).all()
    # with all probabilities forced, the data must actually change
    cfg_on = DA5Config(p_rot90=1.0, p_transpose=1.0, p_median_or_blur=1.0,
                       p_additive_brightness=1.0, p_contrast=1.0,
                       p_blank_rectangles=1.0, p_brightness_gradient=1.0,
                       p_local_gamma=1.0, p_sharpening=1.0, p_per_channel=1.0)
    d3, s3 = apply_da5_extras(jax.random.PRNGKey(1), x, seg, (12, 12, 12), cfg_on)
    assert float(jnp.abs(d3 - x).max()) > 0.01


def test_da5_rot90_consistency_data_seg():
    """rot90/transpose must move data and seg identically (labels stay aligned)."""
    import jax, jax.numpy as jnp
    from anatomask_tpu.data.augment_da5 import rot90_transform, transpose_axes_transform
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 8, 1), jnp.float32)
    seg = (x > 0.5).astype(jnp.int16)
    for i in range(4):
        k = jax.random.PRNGKey(i)
        d2, s2 = rot90_transform(x, seg, k, (8, 8, 8), p=1.0)
        np.testing.assert_array_equal(np.asarray(d2 > 0.5), np.asarray(s2).astype(bool))
        d3, s3 = transpose_axes_transform(x, seg, k, (8, 8, 8), p=1.0)
        np.testing.assert_array_equal(np.asarray(d3 > 0.5), np.asarray(s3).astype(bool))


def test_da5_blank_rectangles_fill_with_region_mean():
    import jax, jax.numpy as jnp
    from anatomask_tpu.data.augment_da5 import DA5Config, blank_rectangles
    x = jnp.ones((1, 16, 16, 16, 1), jnp.float32) * 3.0
    cfg = DA5Config(p_blank_rectangles=1.0, p_per_channel=1.0)
    y = blank_rectangles(x, jax.random.PRNGKey(0), cfg)
    # constant input: region mean == 3 everywhere -> unchanged
    np.testing.assert_allclose(np.asarray(y), 3.0, atol=1e-6)


def test_da5_median3_exact():
    import jax.numpy as jnp
    from anatomask_tpu.data.augment_da5 import _median3
    from scipy import ndimage
    rng = np.random.RandomState(2)
    x = rng.rand(1, 6, 7, 8, 1).astype(np.float32)
    got = np.asarray(_median3(jnp.asarray(x)))[0, ..., 0]
    expect = ndimage.median_filter(x[0, ..., 0], size=3, mode="nearest")
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_da5_trainer_config_wires_extras():
    from anatomask_tpu.training.trainer import get_trainer_config
    cfg = get_trainer_config("ATKTrainerDA5")
    assert cfg.aggressive_da


def test_fused_trilinear_matches_map_coordinates(monkeypatch):
    """The fused single-take trilinear sampler (default) must be bit-close to
    jax.scipy map_coordinates(order=1, constant) incl. out-of-bounds cval."""
    import numpy as np
    from anatomask_tpu.data.augment import _trilinear_sample

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(7, 8, 9), jnp.float32)
    # positions covering interior, boundary, and out-of-range
    pos = jnp.asarray(rng.uniform(-2, 10, (3, 5, 6, 4)), jnp.float32)
    for cval in (0.0, -1.0):
        monkeypatch.setenv("ATK_TRILINEAR", "scipy")
        ref = _trilinear_sample(vol, pos, cval)
        monkeypatch.setenv("ATK_TRILINEAR", "fused")
        got = _trilinear_sample(vol, pos, cval)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_identity_fast_path_matches_vmapped_warp(monkeypatch):
    """The scan+cond identity fast path (default) must reproduce the uniform
    vmapped warp exactly: identity samples are bit-equal central crops
    (power-of-two weights), warped samples run the same warp_one."""
    rng = np.random.RandomState(3)
    # odd AND even in-out differences to cover both crop cases (17-12=5 odd,
    # 16-12=4 even, 14-12=2 even)
    data = jnp.asarray(rng.rand(6, 17, 16, 14, 2), jnp.float32)
    seg = jnp.asarray(rng.randint(0, 3, (6, 17, 16, 14, 1)), jnp.int16)
    cfg = SpatialAugmentConfig(patch_size=(12, 12, 12), p_rotation=0.5,
                               p_scaling=0.5, seg_labels=(1, 2))
    key = jax.random.PRNGKey(0)
    # with batch 6 and p=0.5 draws, both branches occur w.h.p.; assert both
    from anatomask_tpu.data.augment import _affine_matrices
    _, ident = _affine_matrices(key, 6, cfg)
    ident = np.asarray(ident)
    assert ident.any() and not ident.all(), "draws did not cover both branches"

    monkeypatch.setenv("ATK_IDENT_FAST", "0")
    d_ref, s_ref = spatial_augment(data, seg, key, cfg)
    monkeypatch.setenv("ATK_IDENT_FAST", "1")
    d_fast, s_fast = spatial_augment(data, seg, key, cfg)
    np.testing.assert_allclose(np.asarray(d_fast), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_fast), np.asarray(s_ref))
    # identity rows are exact crops: bit-equal
    np.testing.assert_array_equal(np.asarray(d_fast)[ident],
                                  np.asarray(d_ref)[ident])

    # data-only (SSL) path
    d_ref2, _ = spatial_augment(data, None, key, cfg)
    monkeypatch.setenv("ATK_IDENT_FAST", "0")
    d_slow2, _ = spatial_augment(data, None, key, cfg)
    np.testing.assert_allclose(np.asarray(d_ref2), np.asarray(d_slow2),
                               rtol=1e-5, atol=1e-6)


def test_seg_warp_shared_corners_matches_per_label(monkeypatch):
    """The shared-corner seg warp (one gather serves all labels) is
    bit-identical to warping each label indicator separately."""
    import jax.numpy as jnp
    from anatomask_tpu.data.augment import _seg_per_label_sample
    rng = np.random.RandomState(11)
    vol = jnp.asarray(rng.randint(0, 4, (9, 8, 7)), jnp.float32)
    # positions incl. out-of-bounds coords (border_cval_seg=-1 path)
    pos = jnp.asarray(rng.rand(3, 6, 5, 4) * 12.0 - 2.0, jnp.float32)
    labels = (1, 2, 3)
    monkeypatch.setenv("ATK_SEG_WARP", "per_label")
    ref = _seg_per_label_sample(vol, pos, labels)
    monkeypatch.setenv("ATK_SEG_WARP", "shared")
    got = _seg_per_label_sample(vol, pos, labels)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_blur_matches_scipy_gaussian_filter(rng):
    # reference stack (batchgenerators GaussianBlurTransform) blurs with
    # scipy.ndimage.gaussian_filter, whose default boundary mode 'reflect'
    # duplicates the edge sample; pin _blur_volume against it
    from scipy.ndimage import gaussian_filter1d
    from anatomask_tpu.data.augment import _blur_volume
    vol = rng.rand(10, 11, 12).astype(np.float32)
    got = np.asarray(_blur_volume(jnp.array(vol), jnp.float32(1.0)))
    want = vol
    for ax in range(3):
        want = gaussian_filter1d(want, sigma=1.0, axis=ax, mode="reflect",
                                 truncate=4.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_noise_std_is_drawn_value(rng):
    # batchgenerators augment_gaussian_noise passes the value drawn from
    # noise_variance directly as np.random.normal's scale (a std, despite
    # the name) — the added noise std must equal the drawn value, not its sqrt
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    cfg = IntensityAugmentConfig(p_noise=1.0, noise_variance=(0.5, 0.5))
    out = gaussian_noise(x, jax.random.PRNGKey(0), cfg)
    assert float(jnp.std(out)) == pytest.approx(0.5, rel=0.1)


def test_ds_downsample_factor2_picks_upper_neighbor():
    # scipy/skimage order-0 nearest resolves the exact .5 ties at factor 2
    # as floor(x + 0.5): source index 2i+1, not np.round's half-to-even 2i
    seg = jnp.arange(8, dtype=jnp.int16).reshape(1, 8, 1, 1, 1)
    seg = jnp.broadcast_to(seg, (1, 8, 2, 2, 1))
    out = downsample_seg_for_ds(seg, [(2, 1, 1)])[0]
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0, 0, 0], [1, 3, 5, 7])


def test_contrast_two_sided_sampling():
    # augment_contrast draws 50% of factors in (lo, 1) and 50% in (1, hi);
    # with the asymmetric range (0.5, 1.25) a plain uniform would put ~67%
    # below 1 — check the split is ~50/50 (factor < 1 shrinks the std)
    rng_np = np.random.RandomState(3)
    x = jnp.array(rng_np.rand(512, 4, 4, 4, 1).astype(np.float32))
    cfg = IntensityAugmentConfig(p_contrast=1.0, contrast_range=(0.5, 1.25))
    out = contrast(x, jax.random.PRNGKey(7), cfg)
    shrunk = (np.asarray(out).std(axis=(1, 2, 3, 4))
              < np.asarray(x).std(axis=(1, 2, 3, 4))).mean()
    assert 0.40 < shrunk < 0.60
