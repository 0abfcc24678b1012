"""Probe: full SparseSTUNetEncoder at the bench workload, dense (folded
z-concat) vs block-sparse first stages (ATK_BLOCK_SPARSE=1), fwd and
fwd+bwd. This is the model-level complement to probe_blocksparse.py's
stage-chain microbenchmark: it includes the real gather/scatter boundaries,
the per-stage feature outputs for the densify skips, and the deeper dense
stages. Run on the real TPU, one process at a time.
NOTE (round-3 review): timed() dispatches the jitted fn per iteration instead
of chaining inside one jitted fori_loop (CLAUDE.md probe rule) — the ~30 ms
tunnel dispatch overhead lands on BOTH arms equally, so the dense-vs-block
comparison stands, but absolute numbers here are inflated by ~30/iters ms.
"""
import json
import os
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B = 4
PATCH = (112, 112, 128)
LEN_KEEP = 157  # round(7*7*8 * 0.4)


def main():
    from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder, upsample_mask
    from anatomask_tpu.ssl.spark import random_keep_mask

    enc = SparseSTUNetEncoder(depth=(1,) * 5, dims=(32, 64, 128, 256, 512),
                              dtype=jnp.bfloat16, len_keep=LEN_KEEP)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, *PATCH, 1), jnp.bfloat16)
    active = random_keep_mask(jax.random.PRNGKey(1), B, (7, 7, 8), LEN_KEEP)
    xm = x * upsample_mask(active, (16, 16, 16)).astype(x.dtype)
    params = enc.init(jax.random.PRNGKey(0), xm[:1], active[:1])

    def fwd(p, xm, active):
        feats = enc.apply(p, xm, active)
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats)

    grad = jax.grad(fwd)

    def timed(fn, args, iters=6):
        jf = jax.jit(fn)
        out = jf(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / iters

    for mode, env in (("dense", "0"), ("block", "1")):
        os.environ["ATK_BLOCK_SPARSE"] = env
        f = timed(fwd, (params, xm, active))
        g = timed(grad, (params, xm, active))
        print(json.dumps({"variant": mode, "fwd_ms": round(f * 1e3, 2),
                          "fwdbwd_ms": round(g * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
