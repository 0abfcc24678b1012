"""Host->device input pipeline.

Replaces the reference's NonDetMultiThreadedAugmenter process pool
(/root/reference/nnunetv2/training/dataloading/../data_augmentation/
custom_transforms/limited_length_multithreaded_augmenter.py): host threads only
*gather mmap'd patches* (cheap); augmentation runs on-device. Double-buffered
so the device never waits on the host (SURVEY.md §7 'host I/O pipeline').
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class PrefetchPipeline:
    """Pulls batches from `sampler.generate_batch()` on background threads and
    stages them ahead of consumption. Nondeterministic batch order across
    workers (matches the reference's NonDetMultiThreadedAugmenter semantics);
    per-sampler RNG keeps contents reproducible with num_workers=1."""

    def __init__(self, sampler, num_workers: int = 3, prefetch_depth: int = 4,
                 device_put: bool = False, transfer_dtype=None,
                 drop_keys: tuple = ()):
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch_depth)
        self.device_put = device_put
        # batch entries never to transfer (SSL pretraining drops "seg": the
        # sampler needs labels for fg-oversampling but the SSL step does not —
        # ~1/3 of the H2D bytes)
        self.drop_keys = tuple(drop_keys)
        # cast the float image channels before the H2D transfer (bf16 halves
        # the bytes through the host link; the on-device augmentation upcasts
        # to f32 for interpolation, so this matches the reference's AMP
        # numerics class)
        self.transfer_dtype = transfer_dtype
        self._stop = threading.Event()
        self._threads = []
        self._started = False

    def _clone_sampler(self, worker_id: int):
        """Per-worker sampler copy with an independent RNG stream so workers
        sample in parallel (numpy RandomState is not thread-safe; with a single
        worker the original sampler is used, keeping runs reproducible)."""
        if self.num_workers == 1:
            return self.sampler
        import copy
        clone = copy.copy(self.sampler)
        base_seed = self.sampler.rng.randint(0, 2 ** 31 - 1)
        clone.rng = np.random.RandomState(base_seed + worker_id)
        return clone

    def _worker(self, worker_id: int = 0):
        sampler = self._clone_sampler(worker_id)
        while not self._stop.is_set():
            try:
                batch = sampler.generate_batch()
            except Exception as e:  # surface worker death to the consumer
                self.queue.put(e)
                return
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray) and k not in self.drop_keys}
            if self.transfer_dtype is not None:
                arrays = {
                    k: (v.astype(self.transfer_dtype)
                        if np.issubdtype(v.dtype, np.floating) else v)
                    for k, v in arrays.items()
                }
            if self.device_put:
                arrays = jax.device_put(arrays)
            while not self._stop.is_set():
                try:
                    self.queue.put(arrays, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def start(self):
        if self._started:
            return
        self._started = True
        for w in range(self.num_workers):
            t = threading.Thread(target=self._worker, args=(w,), daemon=True)
            t.start()
            self._threads.append(t)

    def __iter__(self) -> Iterator[dict]:
        self.start()
        return self

    def __next__(self) -> dict:
        item = self.queue.get()
        if isinstance(item, Exception):
            raise RuntimeError("data pipeline worker died") from item
        return item

    def stop(self):
        self._stop.set()
        # drain so workers blocked on put can exit
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
