import numpy as np
import jax.numpy as jnp
import pytest

from anatomask_tpu.inference.gaussian import compute_gaussian
from anatomask_tpu.inference.sliding_window import (
    compute_steps_for_sliding_window,
    make_tile_predictor,
    pad_nd_image,
    sliding_window_predict,
)


def test_gaussian_properties():
    g = compute_gaussian((8, 8, 8), value_scaling_factor=1000.0)
    assert g.shape == (8, 8, 8)
    assert g.max() == pytest.approx(1000.0)
    assert g.min() > 0  # zeros replaced
    assert g[4, 4, 4] == g.max()  # peak at center
    # symmetric around center
    np.testing.assert_allclose(g[3], g[5], rtol=1e-5)


def test_steps_reference_example():
    # reference docstring example: size 110, tile 64, step 0.5 -> [0, 23, 46]
    steps = compute_steps_for_sliding_window((110,), (64,), 0.5)
    assert steps == [[0, 23, 46]]


def test_steps_cover_ends():
    steps = compute_steps_for_sliding_window((100, 64, 57), (32, 32, 32), 0.5)
    for dim, (img, tile) in enumerate(zip((100, 64, 57), (32, 32, 32))):
        assert steps[dim][0] == 0
        assert steps[dim][-1] == img - tile


def test_steps_exact_fit():
    steps = compute_steps_for_sliding_window((32, 32, 32), (32, 32, 32), 0.5)
    assert steps == [[0], [0], [0]]


def test_pad_nd_image():
    x = np.arange(2 * 5 * 6 * 7).reshape(2, 5, 6, 7).astype(np.float32)
    padded, slicer = pad_nd_image(x, (8, 6, 10))
    assert padded.shape == (2, 8, 6, 10)
    np.testing.assert_array_equal(padded[slicer], x)
    # symmetric padding: 3 total on axis1 -> 1 low / 2 high
    assert slicer[1] == slice(1, 6)


def test_mirror_tta_equals_sequential(rng):
    """Batched-flip TTA must equal the mean over explicit flipped forwards."""
    x = jnp.asarray(rng.rand(2, 4, 6, 8, 3).astype(np.float32))

    def net(v):  # nonlinear, asymmetric "network"
        return v[..., :2] ** 2 + jnp.cumsum(v[..., :2], axis=1)

    tile_fn = make_tile_predictor(net, mirror_axes=(0, 1, 2))
    out = tile_fn(x)

    import itertools
    preds = []
    for r in range(4):
        for combo in itertools.combinations((1, 2, 3), r):
            preds.append(jnp.flip(net(jnp.flip(x, combo)), combo) if combo else net(x))
    expected = sum(preds) / len(preds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_sliding_window_identity_reconstruction(rng):
    """A tile function that echoes its input must reconstruct the volume exactly
    (Gaussian-weighted average of identical overlapping values)."""
    data = rng.rand(1, 20, 24, 18).astype(np.float32)

    def tile_fn(x):  # (B,tx,ty,tz,1) -> 2 channels: echo and 2*echo
        return jnp.concatenate([x, 2 * x], axis=-1)

    out = sliding_window_predict(
        data, tile_fn, (16, 16, 16), num_output_channels=2,
        tile_step_size=0.5, use_gaussian=True, tile_batch_size=3,
    )
    assert out.shape == (2, 20, 24, 18)
    np.testing.assert_allclose(out[0], data[0], atol=1e-3)
    np.testing.assert_allclose(out[1], 2 * data[0], atol=5e-3)


def test_sliding_window_small_volume_padding(rng):
    """Volume smaller than the tile: pad, predict, un-pad."""
    data = rng.rand(2, 10, 12, 9).astype(np.float32)

    def tile_fn(x):
        return x[..., :1] * 0 + 1.0

    out = sliding_window_predict(data, tile_fn, (16, 16, 16), 1)
    assert out.shape == (1, 10, 12, 9)
    np.testing.assert_allclose(out, 1.0)


def test_device_and_host_accumulation_agree(rng):
    data = rng.rand(1, 20, 24, 18).astype(np.float32)

    def tile_fn(x):
        return jnp.concatenate([x * 0.5, x ** 2], axis=-1)

    dev = sliding_window_predict(data, tile_fn, (16, 16, 16), 2,
                                 accumulate_on_device=True)
    host = sliding_window_predict(data, tile_fn, (16, 16, 16), 2,
                                  accumulate_on_device=False)
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_device_resident_matches_streaming(rng):
    """Whole-volume device-resident sliding window (one jitted scan, zero
    per-tile host traffic) must reproduce the streaming path exactly,
    including the padded-duplicate-tile zero-weighting."""
    from anatomask_tpu.inference.sliding_window import (
        sliding_window_predict_device_resident)
    data = rng.rand(2, 20, 24, 18).astype(np.float32)

    def tile_fn(x):
        return jnp.concatenate([x[..., :1] * 0.5, x.sum(-1, keepdims=True) ** 2],
                               axis=-1)

    for tb in (1, 3):  # 3 does not divide the tile count -> padding exercised
        got = sliding_window_predict_device_resident(
            data, tile_fn, (16, 16, 16), 2, tile_batch_size=tb)
        ref = sliding_window_predict(data, tile_fn, (16, 16, 16), 2,
                                     accumulate_on_device=False)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_is_oom_error_classification():
    """Compile-time and run-time HBM exhaustion must be degradable; other
    runtime errors must surface (predictor.py OOM ladder)."""
    from jax.errors import JaxRuntimeError
    from anatomask_tpu.inference.sliding_window import is_oom_error

    assert is_oom_error(JaxRuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes"))
    assert is_oom_error(JaxRuntimeError(
        "INTERNAL: XLA:TPU compile permanent error. Ran out of memory in "
        "memory space hbm. Used 16.41G of 15.75G hbm."))
    assert is_oom_error(JaxRuntimeError(
        "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1"))
    assert not is_oom_error(JaxRuntimeError("INVALID_ARGUMENT: shape mismatch"))
    assert not is_oom_error(ValueError("Out of memory"))  # not a device error


def test_predictor_oom_ladder_degrades_to_streaming(rng, monkeypatch):
    """An HBM-OOM in the device-resident sliding window must degrade to
    tile_batch 1 and then to the streaming path — never crash (the budget
    gate cannot see the tile forward's TTA-multiplied activations)."""
    from types import MethodType, SimpleNamespace
    from jax.errors import JaxRuntimeError
    from anatomask_tpu.inference import predictor as pred_mod
    from anatomask_tpu.inference.predictor import Predictor

    data = rng.rand(1, 20, 24, 18).astype(np.float32)

    def tile_fn(x):
        return jnp.concatenate([x * 0.5, x ** 2], axis=-1)

    ref = sliding_window_predict(data, tile_fn, (16, 16, 16), 2,
                                 accumulate_on_device=False)

    calls = []

    def oom_device_resident(*a, **kw):
        calls.append(kw.get("tile_batch_size"))
        raise JaxRuntimeError(
            "INTERNAL: XLA:TPU compile permanent error. Ran out of memory "
            "in memory space hbm.")

    monkeypatch.setattr(pred_mod, "sliding_window_predict_device_resident",
                        oom_device_resident)
    self = SimpleNamespace(
        label_manager=SimpleNamespace(num_segmentation_heads=2),
        configuration_manager=SimpleNamespace(patch_size=(16, 16, 16)),
        list_of_parameters=[None],
        tile_step_size=0.5, use_gaussian=True, tile_batch_size=2,
        verbose=False,
        _fits_device_resident=lambda *a, **kw: True,
        _tile_fn_for=lambda p: tile_fn,
        _tile_fn_p=lambda p, x: tile_fn(x),
    )
    got = MethodType(Predictor.predict_sliding_window_return_logits,
                     self)(data)
    assert calls == [2, 1]  # degraded before falling back
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # non-OOM errors must NOT be masked by the ladder
    def broken_device_resident(*a, **kw):
        raise JaxRuntimeError("INVALID_ARGUMENT: shape mismatch")

    monkeypatch.setattr(pred_mod, "sliding_window_predict_device_resident",
                        broken_device_resident)
    with pytest.raises(JaxRuntimeError):
        MethodType(Predictor.predict_sliding_window_return_logits, self)(data)


def test_device_resident_params_shared_compile(rng):
    """Fold params as a traced argument: two different param sets reuse ONE
    cached whole-volume runner (ensembles previously recompiled per fold),
    and results match the closure-mode path exactly."""
    from anatomask_tpu.inference.sliding_window import (
        _device_resident_runner, make_tile_predictor,
        sliding_window_predict_device_resident)

    data = rng.rand(1, 20, 24, 18).astype(np.float32)

    def apply_fn(params, x):
        return jnp.concatenate([x * params["a"], x + params["b"]], axis=-1)

    tile_fn_p = make_tile_predictor(apply_fn, (0, 1), takes_params=True)
    _device_resident_runner.cache_clear()
    outs = []
    for a, b in ((0.5, 1.0), (2.0, -1.0)):
        params = {"a": jnp.float32(a), "b": jnp.float32(b)}
        outs.append(sliding_window_predict_device_resident(
            data, tile_fn_p, (16, 16, 16), 2, tile_batch_size=2,
            params=params))
        tile_fn_c = make_tile_predictor(
            lambda x, a=a, b=b: jnp.concatenate([x * a, x + b], axis=-1),
            (0, 1))
        ref = sliding_window_predict_device_resident(
            data, tile_fn_c, (16, 16, 16), 2, tile_batch_size=2)
        np.testing.assert_allclose(outs[-1], ref, atol=1e-5)
    # one params-mode entry (+ one closure-mode entry per fold fn)
    info = _device_resident_runner.cache_info()
    assert info.currsize == 3  # 1 shared params-mode + 2 closure fns
