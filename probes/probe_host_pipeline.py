"""Quantify the host pipeline share of the real pretrain step on the accuracy
dataset (expects probes/accuracy_loop.py to have preprocessed /tmp/acc):
sampler-only time, H2D transfer time, device step time."""
import os
import time

os.environ.setdefault("ATK_raw", "/tmp/acc/raw")
os.environ.setdefault("ATK_preprocessed", "/tmp/acc/pp")
os.environ.setdefault("ATK_results", "/tmp/acc/res")

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    from anatomask_tpu import paths
    paths.refresh()
    from anatomask_tpu.ssl.pretrain import PretrainConfig, PretrainTrainer
    cfg = PretrainConfig(method="anatomask", model_size="B",
                         patch_size=(112, 112, 128), batch_size=4,
                         num_epochs=1, iters_per_epoch=5,
                         compute_dtype="bfloat16", grad_accum_steps=2,
                         num_workers=1, warmup_epochs=1)
    t = PretrainTrainer("955", cfg)
    t.get_dataloaders()

    # 1. sampler only (synchronous, no device)
    s = t.sampler_train
    b = s.generate_batch()
    t0 = time.perf_counter()
    for _ in range(8):
        b = s.generate_batch()
    dt_sample = (time.perf_counter() - t0) / 8
    nbytes = sum(v.nbytes for v in b.values() if isinstance(v, np.ndarray))
    print(f"sampler: {dt_sample*1e3:.1f} ms/batch ({nbytes/1e6:.1f} MB)", flush=True)

    # 2. H2D transfer of one batch through the tunnel
    arrays = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
    d = jax.device_put(arrays)
    jax.block_until_ready(d)
    float(jax.tree_util.tree_leaves(d)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(4):
        d = jax.device_put(arrays)
        float(jax.tree_util.tree_leaves(d)[0].ravel()[0])
    dt_h2d = (time.perf_counter() - t0) / 4
    print(f"h2d: {dt_h2d*1e3:.1f} ms/batch -> {nbytes/dt_h2d/1e6:.0f} MB/s", flush=True)

    # 3. prefetched loader steady-state (workers overlap sampling + H2D)
    it = iter(t.loader_train)
    for _ in range(3):
        next(it)
    t0 = time.perf_counter()
    for _ in range(8):
        next(it)
    dt_loader = (time.perf_counter() - t0) / 8
    print(f"prefetched loader: {dt_loader*1e3:.1f} ms/batch", flush=True)
    t.loader_train.stop(); t.loader_val.stop()


if __name__ == "__main__":
    main()
