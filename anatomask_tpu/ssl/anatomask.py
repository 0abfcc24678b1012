"""AnatoMask teacher-guided mask generation.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/variants/
pretrain/AnatoMask.py:82-135 (generate_mask): given the teacher's per-patch
reconstruction loss (B, L), with easy-to-hard curriculum
keep_ratio = (epoch+1)/total_epoch * 0.5 when guided:
- len_loss = int((L - len_keep) * keep_ratio) patches with the HIGHEST teacher
  loss are forced masked;
- the remaining (L - len_keep - len_loss) masked patches are drawn uniformly at
  random from the rest;
- if len_loss <= 0 the mask is fully random.
The reference implements the random part with a per-sample numpy
np.delete + np.random.shuffle loop on the host (the CPU hot spot flagged in
SURVEY.md §3.2); here the same distribution is produced fully vectorized
on-device: forced patches get +inf sampling noise, and the keep set is the
len_keep lowest-noise patches — provably the same "top-k forced + uniform rest"
law, inside the jitted train step.

The reference's easy_mask branch is dead/rotted code (ids_shuffle2 zero-filled
tail, result unused in training — SURVEY.md 'known quirks'); we provide a
corrected easy mask (keeps the len_keep+len_loss lowest-noise patches with the
next-hardest band forced masked) for research use.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from anatomask_tpu.ssl.spark import random_keep_mask


def random_mask(rng, batch: int, fmap: Sequence[int], len_keep: int) -> jnp.ndarray:
    return random_keep_mask(rng, batch, fmap, len_keep)


def guided_keep_ratio(epoch, total_epoch: int, guide: bool = True):
    """Easy-to-hard curriculum (AnatoMask.py:93); static 2/3 when unguided."""
    if not guide:
        return 2.0 / 3.0
    return (epoch + 1.0) / total_epoch * 0.5


def generate_guided_mask(
    rng,
    loss_pred: jnp.ndarray,          # (B, L) teacher per-patch recon loss
    fmap: Sequence[int],
    len_keep: int,
    len_loss,                         # int((L - len_keep) * keep_ratio); may be TRACED
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (hard_mask, easy_mask) as (B, f1, f2, f3, 1) bool, True = keep.

    hard: the len_loss highest-teacher-loss patches are always masked; the other
    masked slots are uniform over the remainder. len_loss may be a traced
    scalar (the epoch curriculum updates it without recompiling the train
    step); len_loss <= 0 degenerates automatically to the pure random mask
    (no patches forced -> keep set is len_keep lowest-noise = uniform)."""
    B, L = loss_pred.shape
    f1, f2, f3 = fmap

    # rank of each patch by teacher loss (descending): rank 0 = hardest
    order = jnp.argsort(-loss_pred, axis=1)
    ranks = jnp.argsort(order, axis=1)  # ranks[b, j] = position of patch j

    noise = jax.random.uniform(rng, (B, L))
    # hard mask: top-len_loss hardest forced masked (never kept)
    forced_hard = ranks < len_loss
    noise_hard = jnp.where(forced_hard, jnp.inf, noise)
    keep_rank = jnp.argsort(jnp.argsort(noise_hard, axis=1), axis=1)
    hard_keep = keep_rank < len_keep

    # easy mask: the next-hardest band (len_loss..2*len_loss) forced masked,
    # keep budget enlarged by len_loss (masks fewer patches overall)
    band = (ranks >= len_loss) & (ranks < 2 * len_loss)
    noise_easy = jnp.where(band, jnp.inf, noise)
    keep_rank2 = jnp.argsort(jnp.argsort(noise_easy, axis=1), axis=1)
    easy_keep = keep_rank2 < (len_keep + len_loss)

    return (hard_keep.reshape(B, f1, f2, f3, 1),
            easy_keep.reshape(B, f1, f2, f3, 1))
