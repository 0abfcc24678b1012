import numpy as np
import pytest

from anatomask_tpu.parallel.mesh import (
    compute_shard_batch_and_oversample,
    make_data_mesh,
)


def test_shard_batch_partition_reconstructs_global_policy():
    """Union of per-shard forced-fg counts == global policy (reference
    _set_batch_size_and_oversample semantics)."""
    for B, p, world in [(12, 0.33, 4), (7, 0.33, 3), (8, 0.5, 8), (10, 0.1, 2)]:
        total_forced_global = B - round(B * (1 - p))
        sizes, forced = [], 0.0
        for r in range(world):
            bs, frac = compute_shard_batch_and_oversample(B, p, r, world)
            sizes.append(bs)
            forced += bs * frac
        assert sum(sizes) == B
        assert forced == pytest.approx(total_forced_global, abs=1e-9)


def test_shard_batch_tail_property():
    # forced-fg samples must be the TAIL: earlier shards have fraction 0 before
    # later shards have fraction > 0
    fracs = [compute_shard_batch_and_oversample(12, 0.33, r, 4)[1] for r in range(4)]
    nonzero_started = False
    for f in fracs:
        if f > 0:
            nonzero_started = True
        elif nonzero_started:
            pytest.fail(f"non-tail forced-foreground distribution: {fracs}")


def test_make_data_mesh():
    mesh = make_data_mesh(4)
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (4,)
