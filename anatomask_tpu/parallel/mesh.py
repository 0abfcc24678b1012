"""Device mesh + multi-host helpers.

Capability parity: the reference's distributed layer is torch DDP + NCCL
(/root/reference/nnunetv2/run/run_training.py:108-142: mp.spawn + env
MASTER_ADDR/PORT + init_process_group('nccl')). TPU-native replacement:
jax.distributed.initialize() (DCN across hosts, ICI within a slice) + a
Mesh(('data',)) over all global devices; one SPMD program, no per-rank process
topology management.

compute_shard_batch_and_oversample reproduces the reference's per-rank batch
partition (_set_batch_size_and_oversample, nnUNetTrainer.py:295-340): the
global batch is split as evenly as possible across shards, and per-shard
oversample fractions are arranged so that the FORCED-FOREGROUND samples are
exactly the tail of the global batch.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-host environment is detected
    (JAX_COORDINATOR_ADDRESS / megascale env). Safe no-op otherwise."""
    import jax
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            return True
        except Exception as e:  # already initialized / single process
            print(f"jax.distributed.initialize skipped: {e}")
    return False


def make_data_mesh(max_devices: Optional[int] = None):
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    return Mesh(np.array(devices), ("data",))


def compute_shard_batch_and_oversample(
    global_batch_size: int,
    oversample_foreground_percent: float,
    shard_rank: int,
    num_shards: int,
) -> Tuple[int, float]:
    """Returns (shard_batch_size, shard_oversample_percent).

    Semantics (reference nnUNetTrainer._set_batch_size_and_oversample): sample
    index s in the GLOBAL batch is forced-foreground iff
    s >= round(B * (1 - p)). Each shard owns a contiguous index range; its
    local oversample fraction is the portion of its range at/after that
    threshold, so the union over shards reproduces the global policy exactly.
    """
    assert global_batch_size >= num_shards, (
        "global batch size must be >= number of shards"
    )
    base = global_batch_size // num_shards
    rem = global_batch_size % num_shards
    sizes = [base + (1 if r < rem else 0) for r in range(num_shards)]
    starts = np.cumsum([0] + sizes[:-1])
    lo = int(starts[shard_rank])
    hi = lo + sizes[shard_rank]

    threshold = round(global_batch_size * (1 - oversample_foreground_percent))
    if hi <= threshold:
        frac = 0.0
    elif lo >= threshold:
        frac = 1.0
    else:
        frac = (hi - threshold) / sizes[shard_rank]
    return sizes[shard_rank], float(frac)
