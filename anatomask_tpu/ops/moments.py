"""Per-row moment reductions on folded (B*D, H, W, C) activations.

The folded norms (InstanceNorm / SparseInstanceNorm in folded form) spend
their time in per-row sum(x) / sum(x^2) reductions, which XLA's loop-fusion
reduce emitter runs at 135-335 GB/s on v5e — well under HBM peak
(probes/probe_rowstats.py). ATK_MOMENTS=dot re-expresses the H reduction as
a ones-vector dot_general so the tensor streams through the MXU pipeline
instead, with both moments sharing one pass via a channel-stacked operand
(probes/probe_moments.py measures the variants at the hot bench shapes).

Both formulations accumulate in fp32 and compute the same sums (different
association only). Reference op being accelerated: torch InstanceNorm3d /
the AnatoMask SparseInstanceNorm active-voxel statistics
(/root/reference/STuNet_mask/encoder3D.py sparse norm layers).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def folded_row_sums(x: jnp.ndarray, mx: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 per-row sums of (masked) x and x^2: (N, C) each.

    x: (N, H, W, C); mx: optional broadcastable mask (N, H, W, 1) in x.dtype.
    With a mask, returns (sum(x*m), sum(x^2*m)) — the elementwise products are
    formed in x.dtype (matching the reduce formulation) and only the
    accumulation is fp32.
    """
    n, h, w, c = x.shape
    xm = x if mx is None else x * mx
    mode = os.environ.get("ATK_MOMENTS", "reduce")
    if mode == "dot":
        stacked = jnp.concatenate([xm, x * xm], axis=-1)      # (N, H, W, 2C)
        ones = jnp.ones((1, h), x.dtype)
        # contract H: (1, H) x (N, H, W*2C) -> (1, N, W*2C), fp32 accumulate
        red = jax.lax.dot_general(
            ones, stacked.reshape(n, h, w * 2 * c),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        red = red.reshape(n, w, 2 * c).sum(1, dtype=jnp.float32)
        return red[:, :c], red[:, c:]
    if mode == "dot_hw":
        # contract the full H*W extent in ONE dot: (1, HW) x (N, HW, 2C)
        stacked = jnp.concatenate([xm, x * xm], axis=-1)      # (N, H, W, 2C)
        ones = jnp.ones((1, h * w), x.dtype)
        red = jax.lax.dot_general(
            ones, stacked.reshape(n, h * w, 2 * c),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        red = red.reshape(n, 2 * c)
        return red[:, :c], red[:, c:]
    s = jnp.sum(xm, (1, 2), dtype=jnp.float32)
    ss = jnp.sum(x * xm, (1, 2), dtype=jnp.float32)
    return s, ss
