"""HBM-resident case cache: device-side patch extraction for pretraining.

Replaces the per-step host->device batch transfer (the reference streams every
batch out of a 12-process batchgenerators pipeline,
/root/reference/nnunetv2/training/dataloading/ + documentation/benchmarking.md)
with a TPU-native design:

- a rotating window of preprocessed cases lives in HBM as ONE (S, X, Y, Z, C)
  array (bf16), each slot holding a case (or a random window of a large case)
  zero-padded into a uniform slot shape with an `initial_patch`-sized margin so
  every reference bbox (including the negative / beyond-extent origins that
  the reference realizes by zero-padding, base_data_loader.py:75-139) maps to
  an in-bounds slot origin;
- per step the HOST only draws (slot, origin) pairs (the foreground-
  oversampling logic runs on translated, subsampled class_locations) — a few
  hundred bytes H2D instead of ~100 MB;
- patches are dynamic-sliced out of the cache ON DEVICE (one jitted gather)
  and fed to the unchanged augment+train step;
- slots refill in the background (host thread stages the next case; the train
  loop applies at most one in-place slot update between steps), so fresh data
  trickles in without ever blocking the device.

Sampling fidelity vs the host PatchSampler: identical bbox/oversampling
formulas against the cached window's geometry. For cases larger than the
window cap the patch distribution covers a rotating random window per refill
instead of the whole case each draw — documented divergence, bounded by
refill cycling; the host pipeline remains the default for supervised training.

Supervised training (include_seg=True): the seg channels are stacked after the
image channels in the same slot array (margin filled with -1, the reference's
out-of-bounds seg pad, data_loader_3d.py:7-49) and split off after the device
extraction. Labels are stored in the cache dtype; bf16 represents integers in
[-256, 256] exactly, so Trainer gates the cache on max|label| <= 256. Beyond
fixing the per-step H2D transfer cost, on this dev environment the cache also
sidesteps a measured axon-client defect: EVERY host->device transfer leaks its
full host buffer (~100% of bytes, never reclaimed; see CLAUDE.md), which
OOM-killed long host-pipeline runs.
"""
from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anatomask_tpu.data.dataset import CaseDataset


class _SlotMeta:
    __slots__ = ("key", "offset", "extent", "class_locations")

    def __init__(self, key, offset, extent, class_locations):
        self.key = key
        self.offset = np.asarray(offset, int)    # case-window origin in slot
        self.extent = np.asarray(extent, int)    # case-window size
        self.class_locations = class_locations   # {cls: (n, 3) slot coords}


def extract_patches_impl(cache, slots, origins, patch):
    """Traceable body shared by every cache consumer (the jit below and the
    supervised Trainer's sharded extract): cache (S, X, Y, Z, C); slots (B,)
    int32; origins (B, 3) int32 -> (B, *patch, C)."""
    px, py, pz = (int(v) for v in patch)

    def one(s, o):
        return jax.lax.dynamic_slice(
            cache, (s, o[0], o[1], o[2], 0),
            (1, px, py, pz, cache.shape[-1]))[0]

    return jax.vmap(one)(slots, origins)


_extract_patches = partial(jax.jit, static_argnames=("patch",),
                           donate_argnums=())(extract_patches_impl)


# in-place (donated) single-slot refill
_write_slot = jax.jit(
    lambda cache, idx, slot_data: jax.lax.dynamic_update_slice(
        cache, slot_data[None], (idx, 0, 0, 0, 0)),
    donate_argnums=(0,))


class DeviceCaseCache:
    """See module docstring. Use `sample_batch()` + `extract()` per step and
    `maybe_refill()` between steps."""

    def __init__(
        self,
        dataset: CaseDataset,
        initial_patch: Sequence[int],        # sampled (enlarged) patch
        final_patch: Sequence[int],          # network patch
        capacity_mb: int = 1024,
        oversample_foreground_percent: float = 0.33,
        probabilistic_oversampling: bool = False,
        annotated_classes_key: Optional[tuple] = None,
        has_ignore: bool = False,
        batch_size: int = 2,
        dtype=jnp.bfloat16,
        seed: Optional[int] = None,
        window_cap: Optional[Sequence[int]] = None,
        max_class_locs: int = 5000,
        sharding=None,
        include_seg: bool = False,
        seg_fill: float = -1.0,
        whole_dataset_mode: bool = False,
    ):
        self.dataset = dataset
        self.keys = sorted(dataset.keys())
        self.initial_patch = np.asarray(initial_patch, int)
        self.final_patch = np.asarray(final_patch, int)
        self.batch_size = batch_size
        self.oversample_foreground_percent = oversample_foreground_percent
        self.probabilistic_oversampling = probabilistic_oversampling
        self.annotated_classes_key = annotated_classes_key
        self.has_ignore = has_ignore
        self.max_class_locs = max_class_locs
        self.rng = np.random.RandomState(seed)
        # the refill WORKER thread draws windows/class-loc subsamples
        # concurrently with the train thread's sample_batch draws — numpy
        # RandomState is not thread-safe, so slot preparation gets its own
        # stream (pipeline.py clones samplers per worker for the same reason)
        self.refill_rng = np.random.RandomState(None if seed is None
                                                else seed + 9173)
        self.dtype = dtype
        self.sharding = sharding
        self.include_seg = include_seg
        self.seg_fill = float(seg_fill)

        # survey case shapes from the npy/npz HEADERS only (a full load_case
        # on the npz fallback would decompress every case just for .shape);
        # dataset stand-ins without case_shape fall back to loading
        def _shape(k):
            if hasattr(dataset, "case_shape"):
                return tuple(dataset.case_shape(k))
            return dataset.load_case(k)[0].shape

        # header-only case_shape makes a full survey cheap; without it the
        # survey is capped at 64 loads UNLESS whole-dataset residency is on
        # the table — covers_whole_cases below must have seen EVERY case
        # before refills may be turned off
        n_survey = (len(self.keys)
                    if (whole_dataset_mode or hasattr(dataset, "case_shape"))
                    else min(len(self.keys), 64))
        shapes = [_shape(k) for k in self.keys[:n_survey]]
        self.num_data_channels = shapes[0][0]
        self.num_seg_channels = 0
        if include_seg:
            # seg channel count comes from one real load (mmap'd: cheap);
            # cascade stacks the previous-stage seg as extra channels
            self.num_seg_channels = dataset.load_case(self.keys[0])[1].shape[0]
        self.num_channels = self.num_data_channels + self.num_seg_channels
        max_shape = np.max(np.asarray([s[1:] for s in shapes], int), axis=0)
        cap = (np.asarray(window_cap, int) if window_cap is not None
               else self.initial_patch * 2)
        self.window = np.minimum(max_shape, np.maximum(cap, self.initial_patch))
        self.slot_shape = tuple(int(v) for v in (self.window + self.initial_patch))

        bytes_per_slot = int(np.prod(self.slot_shape)) * self.num_channels * (
            2 if dtype == jnp.bfloat16 else 4)
        budget_slots = (capacity_mb * 2 ** 20) // bytes_per_slot
        if budget_slots < 2:
            print(f"[device-cache] WARNING: slot size "
                  f"{bytes_per_slot / 2**20:.0f} MB x 2 exceeds the "
                  f"{capacity_mb} MB budget; allocating 2 slots anyway "
                  f"({2 * bytes_per_slot / 2**20:.0f} MB of HBM) — shrink "
                  f"window_cap or raise device_cache_mb", flush=True)
        # whole-dataset residency: when every case fits its window untruncated
        # AND the budget holds one slot per case, pin exactly one slot per
        # case — uniform case sampling (matches the host sampler's key draw)
        # and background refills become pure redundancy (caller may skip
        # start_refill entirely)
        self.covers_whole_cases = (bool(np.all(self.window >= max_shape))
                                   and n_survey == len(self.keys))
        if (whole_dataset_mode and self.covers_whole_cases
                and budget_slots >= len(self.keys)):
            self.num_slots = max(2, len(self.keys))
            self.whole_dataset_resident = True
        else:
            self.num_slots = max(2, min(len(self.keys) * 4, budget_slots))
            self.whole_dataset_resident = False
        self.meta: List[Optional[_SlotMeta]] = [None] * self.num_slots
        self._key_cursor = 0
        self._refill_queue: "queue.Queue" = queue.Queue(maxsize=2)
        self._refill_thread = None
        self._stop = threading.Event()

        host = np.zeros((self.num_slots, *self.slot_shape, self.num_channels),
                        np.float32)
        for s in range(self.num_slots):
            arr, meta = self._prepare_slot_host()
            host[s] = arr
            self.meta[s] = meta
        self.cache = jnp.asarray(host, dtype)
        if self.sharding is not None:
            self.cache = jax.device_put(self.cache, self.sharding)
        del host
        self._refill_cursor = 0

    # --- host-side slot preparation ------------------------------------------
    def _next_key(self) -> str:
        if self._key_cursor == 0:
            self._order = self.refill_rng.permutation(len(self.keys))
        k = self.keys[int(self._order[self._key_cursor])]
        self._key_cursor = (self._key_cursor + 1) % len(self.keys)
        return k

    def _prepare_slot_host(self) -> Tuple[np.ndarray, _SlotMeta]:
        key = self._next_key()
        data, seg, props = self.dataset.load_case(key)
        case_shape = np.asarray(data.shape[1:], int)
        win = np.minimum(case_shape, self.window)
        # random window for oversized cases (re-randomized each refill)
        lo = np.array([self.refill_rng.randint(0, c - w + 1) if c > w else 0
                       for c, w in zip(case_shape, win)])
        offset = ((np.asarray(self.slot_shape) - win) // 2).astype(int)
        slot = np.zeros((*self.slot_shape, self.num_channels), np.float32)
        if self.include_seg:
            # out-of-case margin: data pads with 0, seg with -1 (reference
            # data_loader_3d.py:7-49 pad semantics)
            slot[..., self.num_data_channels:] = self.seg_fill
        sl_src = tuple(slice(int(l), int(l + w)) for l, w in zip(lo, win))
        sl_dst = tuple(slice(int(o), int(o + w)) for o, w in zip(offset, win))
        block = np.moveaxis(np.asarray(data[(slice(None), *sl_src)]), 0, -1)
        if self.include_seg:
            seg_block = np.moveaxis(np.asarray(seg[(slice(None), *sl_src)]), 0, -1)
            block = np.concatenate(
                [block.astype(slot.dtype), seg_block.astype(slot.dtype)], axis=-1)
        slot[sl_dst] = block.astype(slot.dtype)

        # translate class_locations into slot coordinates, window-filtered
        cls_locs: Dict = {}
        raw = (props or {}).get("class_locations") or {}
        for cls, locs in raw.items():
            locs = np.asarray(locs)
            if locs.size == 0:
                continue
            coords = locs[:, -3:]  # (sample?, x, y, z) -> spatial tail
            keep = np.all((coords >= lo) & (coords < lo + win), axis=1)
            coords = coords[keep] - lo + offset
            if len(coords) > self.max_class_locs:
                coords = coords[self.refill_rng.choice(len(coords),
                                                self.max_class_locs,
                                                replace=False)]
            if len(coords):
                cls_locs[cls] = coords
        return slot, _SlotMeta(key, offset, win, cls_locs)

    # --- sampling -------------------------------------------------------------
    def _do_oversample(self, i: int) -> bool:
        if self.probabilistic_oversampling:
            return bool(self.rng.uniform() < self.oversample_foreground_percent)
        return not i < round(self.batch_size
                             * (1 - self.oversample_foreground_percent))

    def _bbox_for_slot(self, meta: _SlotMeta, force_fg: bool) -> np.ndarray:
        """Reference get_bbox formulas (base_data_loader.py:75-139) against the
        slot geometry; slot margins make every origin in-bounds."""
        patch = self.initial_patch
        extent = meta.extent
        need = np.maximum(patch - self.final_patch, 0)
        need = np.where(need + extent < patch, patch - extent, need)
        lbs = meta.offset - need // 2
        ubs = meta.offset + extent + need // 2 + need % 2 - patch
        ubs = np.maximum(ubs, lbs)
        if force_fg and meta.class_locations:
            classes = [c for c in meta.class_locations
                       if not (self.has_ignore
                               and c == self.annotated_classes_key)]
            if classes:
                cls = classes[int(self.rng.randint(len(classes)))]
                locs = meta.class_locations[cls]
                voxel = locs[int(self.rng.randint(len(locs)))]
                lo = np.maximum(lbs, voxel - patch // 2)
                return np.minimum(lo, ubs).astype(np.int32)
        return np.array([self.rng.randint(l, u + 1)
                         for l, u in zip(lbs, ubs)], np.int32)

    def sample_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        """-> (slots (B,) int32, origins (B, 3) int32)."""
        slots = self.rng.randint(0, self.num_slots, self.batch_size).astype(np.int32)
        origins = np.stack([
            self._bbox_for_slot(self.meta[int(s)], self._do_oversample(i))
            for i, s in enumerate(slots)
        ])
        return slots, origins.astype(np.int32)

    def sample_chunk(self, n_steps: int) -> Tuple[np.ndarray, np.ndarray]:
        """Draw `n_steps` consecutive batches (same RNG stream as n_steps
        sample_batch calls) -> (slots (K, B) int32, origins (K, B, 3) int32).
        Used by the chunked scan training path: slot meta stays fixed within
        a chunk (refills are only applied between chunks)."""
        draws = [self.sample_batch() for _ in range(n_steps)]
        return (np.stack([d[0] for d in draws]),
                np.stack([d[1] for d in draws]))

    def extract(self, slots: np.ndarray, origins: np.ndarray) -> jnp.ndarray:
        """Device-side gather -> (B, *initial_patch, C)."""
        return _extract_patches(self.cache, jnp.asarray(slots),
                                jnp.asarray(origins),
                                tuple(int(p) for p in self.initial_patch))

    # --- background refill ----------------------------------------------------
    def start_refill(self, steps_per_slot: Optional[int] = None):
        """Begin background refills. `steps_per_slot` throttles turnover: one
        slot replacement at most every that-many `maybe_refill` calls
        (default: cache cycles once per `num_slots * 4` steps — each slot
        lives ~4*num_slots steps). Refills must be RARE relative to steps:
        a slot is tens of MB of H2D, and an unthrottled refill per step
        saturates slow host links (measured on the dev tunnel: ~150 s/epoch
        of fetch-wait at 8 slots / 100 steps)."""
        if self._refill_thread is not None:
            return
        self._refill_every = max(1, int(steps_per_slot if steps_per_slot
                                        is not None else 4))
        self._steps_since_refill = 0

        def worker():
            while not self._stop.is_set():
                try:
                    arr, meta = self._prepare_slot_host()
                    # device transfer on the WORKER thread; cast on HOST
                    # first (bf16 halves the bytes) so the H2D ships the
                    # final dtype and overlaps the train steps
                    import ml_dtypes
                    host_dtype = (ml_dtypes.bfloat16
                                  if self.dtype == jnp.bfloat16 else np.float32)
                    dev = jax.device_put(arr.astype(host_dtype))
                    if self.sharding is not None:
                        from jax.sharding import NamedSharding, PartitionSpec
                        dev = jax.device_put(dev, NamedSharding(
                            self.sharding.mesh, PartitionSpec()))
                    item = (dev, meta)
                except Exception as e:
                    self._refill_queue.put(e)
                    return
                while not self._stop.is_set():
                    try:
                        self._refill_queue.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._refill_thread = threading.Thread(target=worker, daemon=True)
        self._refill_thread.start()

    def maybe_refill(self, steps: int = 1) -> int:
        """Apply staged slot refills, at most one per `steps_per_slot` train
        steps (non-blocking). `steps` is how many train steps the caller ran
        since the last call — chunked training advances several steps per
        call, and epoch-granular callers (the val cache) pass a whole epoch's
        worth, earning several replacements in one call. Accrued credit is
        capped at the staging-queue depth so a long stall can't be followed
        by an unthrottled burst. Returns the number of slots replaced."""
        every = getattr(self, "_refill_every", 1)
        self._steps_since_refill = min(
            getattr(self, "_steps_since_refill", 0) + steps,
            self._refill_queue.maxsize * every)
        applied = 0
        while self._steps_since_refill >= every:
            try:
                item = self._refill_queue.get_nowait()
            except queue.Empty:
                break
            if isinstance(item, Exception):
                raise RuntimeError("device-cache refill worker died") from item
            dev, meta = item
            self._steps_since_refill -= every
            idx = self._refill_cursor
            self._refill_cursor = (self._refill_cursor + 1) % self.num_slots
            self.cache = _write_slot(self.cache, jnp.int32(idx), dev)
            self.meta[idx] = meta
            applied += 1
        return applied

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._refill_queue.get_nowait()
        except queue.Empty:
            pass
