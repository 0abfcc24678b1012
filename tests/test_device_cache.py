"""HBM-resident case cache (data/device_cache.py): device-side patch
extraction must reproduce the case voxels exactly, honor the bbox margin
invariants, target foreground when forced, and refill slots in place."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from anatomask_tpu.data.device_cache import DeviceCaseCache


class FakeDataset:
    """Minimal CaseDataset stand-in: key -> (data (c,x,y,z), seg, props)."""

    def __init__(self, cases):
        self._cases = cases

    def keys(self):
        return self._cases.keys()

    def load_case(self, key):
        return self._cases[key]


def _make_case(rng, shape, fg_voxel=None):
    data = rng.rand(1, *shape).astype(np.float32)
    locs = np.empty((0, 4))
    if fg_voxel is not None:
        locs = np.array([[0, *fg_voxel]] * 5)
    props = {"class_locations": {1: locs}}
    return data, None, props


@pytest.fixture
def cache():
    rng = np.random.RandomState(0)
    cases = {
        "a": _make_case(rng, (12, 14, 16), fg_voxel=(6, 7, 8)),
        "b": _make_case(rng, (10, 12, 10), fg_voxel=(5, 5, 5)),
        "c": _make_case(rng, (30, 30, 30), fg_voxel=(15, 15, 15)),  # windowed
    }
    return DeviceCaseCache(
        FakeDataset(cases), initial_patch=(8, 8, 8), final_patch=(6, 6, 6),
        capacity_mb=64, batch_size=4, dtype=jnp.float32, seed=3,
        annotated_classes_key=(1,), window_cap=(16, 16, 16),
    ), cases


def test_extract_matches_host_voxels(cache):
    c, cases = cache
    for _ in range(5):
        slots, origins = c.sample_batch()
        patches = np.asarray(c.extract(slots, origins))
        assert patches.shape == (4, 8, 8, 8, 1)
        # re-slice on the host from the slot array and compare
        host_cache = np.asarray(c.cache)
        for i in range(4):
            s, o = int(slots[i]), origins[i]
            ref = host_cache[s, o[0]:o[0] + 8, o[1]:o[1] + 8, o[2]:o[2] + 8]
            np.testing.assert_array_equal(patches[i], ref)


def test_origins_always_in_bounds(cache):
    c, _ = cache
    for _ in range(30):
        slots, origins = c.sample_batch()
        for s, o in zip(slots, origins):
            assert np.all(o >= 0)
            assert np.all(o + 8 <= np.asarray(c.slot_shape))


def test_slot_contains_case_window(cache):
    """The case window must sit at meta.offset inside the slot, zeros
    outside (the reference's pad-with-0 semantics)."""
    c, cases = cache
    host_cache = np.asarray(c.cache)
    for s in range(c.num_slots):
        meta = c.meta[s]
        data = cases[meta.key][0]
        sl = host_cache[s]
        inside = sl[tuple(slice(int(o), int(o + e))
                          for o, e in zip(meta.offset, meta.extent))]
        # window is SOME contiguous block of the case with matching extent
        assert inside.shape[:3] == tuple(meta.extent)
        assert inside.any()
        # zero margin outside the window
        total = sl.sum()
        np.testing.assert_allclose(total, inside.sum(), rtol=1e-6)


def test_forced_fg_targets_class_voxel(cache):
    """With oversample=1.0 every bbox must contain a class voxel (when the
    window holds one)."""
    c, _ = cache
    c.oversample_foreground_percent = 1.0
    c.probabilistic_oversampling = True
    hits = 0
    for _ in range(20):
        slots, origins = c.sample_batch()
        for s, o in zip(slots, origins):
            meta = c.meta[int(s)]
            if not meta.class_locations:
                continue
            locs = meta.class_locations[1]
            contained = np.any(np.all((locs >= o) & (locs < o + 8), axis=1))
            hits += bool(contained)
            assert contained
    assert hits > 0


def test_refill_replaces_slot(cache):
    c, _ = cache
    c.start_refill()
    import time
    deadline = time.time() + 10
    replaced = False
    while time.time() < deadline and not replaced:
        replaced = c.maybe_refill()
        time.sleep(0.05)
    c.stop()
    assert replaced
    # metadata still coherent and extraction still works
    slots, origins = c.sample_batch()
    assert np.asarray(c.extract(slots, origins)).shape == (4, 8, 8, 8, 1)


def test_sample_chunk_matches_batch_stream(cache):
    """sample_chunk(K) must consume the same RNG stream as K sample_batch
    calls (chunked training keeps the sampling distribution identical)."""
    import copy
    c, _ = cache
    state = c.rng.get_state()
    expect = [c.sample_batch() for _ in range(3)]
    c.rng.set_state(state)
    slots, origins = c.sample_chunk(3)
    assert slots.shape == (3, 4) and origins.shape == (3, 4, 3)
    for i, (es, eo) in enumerate(expect):
        np.testing.assert_array_equal(slots[i], es)
        np.testing.assert_array_equal(origins[i], eo)


def test_refill_throttle_counts_chunk_steps(cache):
    c, _ = cache
    c.start_refill(steps_per_slot=8)
    import time
    deadline = time.time() + 10
    # wait until a staged refill is available, counting in chunk units
    applied = False
    while time.time() < deadline and not applied:
        applied = c.maybe_refill(steps=4)  # 2 calls >= 8 steps
        time.sleep(0.05)
    c.stop()
    assert applied


def test_refill_credit_applies_multiple_slots(cache):
    """Epoch-granular callers (the val cache) pass a whole epoch's worth of
    steps in ONE maybe_refill call; the credit must buy several slot
    replacements (bounded by the staging-queue depth), not one."""
    import time
    c, _ = cache
    c.start_refill(steps_per_slot=4)
    deadline = time.time() + 10
    while time.time() < deadline and c._refill_queue.qsize() < 2:
        time.sleep(0.05)
    assert c._refill_queue.qsize() >= 2
    applied = c.maybe_refill(steps=1000)
    c.stop()
    assert applied == 2


def test_whole_dataset_residency_requires_full_survey():
    """covers_whole_cases must never be claimed from a truncated shape
    survey: with >64 cases and the largest sorting last, residency mode has
    to notice the oversized case (and an incomplete survey alone must
    forbid turning refills off)."""
    rng = np.random.RandomState(1)
    cases = {f"c{i:03d}": _make_case(rng, (4, 4, 4)) for i in range(69)}
    cases["c069"] = _make_case(rng, (12, 12, 12))  # sorts after the cap
    kw = dict(initial_patch=(4, 4, 4), final_patch=(4, 4, 4), capacity_mb=1,
              batch_size=2, dtype=jnp.float32, seed=0, window_cap=(6, 6, 6))
    c = DeviceCaseCache(FakeDataset(cases), whole_dataset_mode=True, **kw)
    assert not c.covers_whole_cases
    assert not c.whole_dataset_resident
    # all-fitting dataset, but no case_shape and not in whole-dataset mode:
    # the 64-case survey cap means the invariant cannot be certified
    cases_small = {f"c{i:03d}": _make_case(rng, (4, 4, 4)) for i in range(70)}
    c2 = DeviceCaseCache(FakeDataset(cases_small), whole_dataset_mode=False,
                         **kw)
    assert not c2.covers_whole_cases
