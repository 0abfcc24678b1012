"""Probe: block-sparse student-encoder stage vs dense z-concat execution.

The SparK/AnatoMask student computes on an input that is ZERO outside the
active 16^3 blocks (reference encoder3D.py computes densely and re-masks;
mask_ratio 0.6 -> only ~40% of blocks carry signal). This probe measures the
neighbor-table + face-halo block-layout design (VERDICT r2 item 2):

- active blocks gathered once into a (B*K, bs, bs, bs, C) block batch
  (K = len_keep is STATIC, so all shapes are static);
- each conv consumes a 1-voxel halo assembled from the 26 neighbors' faces /
  edges / corners via a per-block neighbor-position table (row gathers with
  large contiguous lanes; inactive or out-of-grid neighbors contribute the
  zeros the dense-masked computation would);
- masked InstanceNorm stats reduce over block interiors (a disjoint cover of
  the active voxels, so each voxel counts once, exactly like the dense
  masked-moment norm);
- convs run through the same conv3d_zconcat_folded lowering as the dense
  path, on the folded (B*K*bs, bs, bs, C) block batch.

Exactness vs the dense masked chain is asserted at all active voxels, then
fwd / fwd+bwd are timed at the bench stage-0 workload.
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

from anatomask_tpu.ops.conv_lowering import conv3d_zconcat_folded


from anatomask_tpu.ops.block_sparse import (
    block_gather,
    block_scatter,
    halo_exchange,
    neighbor_positions,
    block_conv3 as block_conv_pkg,
)


# ------------------------------------------------------------------- chains
def conv_folded(xf, depth, k, valid):
    pad = ((0, 0),) * 3 if valid else ((1, 1),) * 3
    return conv3d_zconcat_folded(xf, depth, k, (1, 1, 1), pad)


block_conv = block_conv_pkg


def block_instance_norm(blocks, eps=1e-5):
    """Per-(sample, channel) stats over ALL block voxels (the blocks are a
    disjoint cover of the active voxels)."""
    B = blocks.shape[0]
    C = blocks.shape[-1]
    x32 = blocks.astype(jnp.float32).reshape(B, -1, C)
    mean = x32.mean(1)
    var = jnp.maximum((x32 * x32).mean(1) - mean * mean, 0.0)
    a = jax.lax.rsqrt(var + eps)
    return ((blocks.astype(jnp.float32) - mean[:, None, None, None, None, :])
            * a[:, None, None, None, None, :]).astype(blocks.dtype)


def dense_instance_norm_masked(xf, m, eps=1e-5):
    """Masked-moment IN on folded dense input; m is the folded {0,1} mask."""
    N, H, W, C = xf.shape
    x32 = xf.astype(jnp.float32) * m
    cnt = m.sum()
    # single-sample folded probe: stats over the whole folded batch
    mean = x32.sum((0, 1, 2)) / cnt
    var = jnp.maximum((x32 * x32).sum((0, 1, 2)) / cnt - mean * mean, 0.0)
    a = jax.lax.rsqrt(var + eps)
    return (((xf.astype(jnp.float32) - mean) * a) * m).astype(xf.dtype)


def dense_chain(xf, depth, m, k1, k2):
    """Masked dense: conv -> remask -> IN -> lrelu -> conv -> remask -> IN."""
    y = conv_folded(xf, depth, k1, valid=False) * m
    y = jax.nn.leaky_relu(dense_instance_norm_masked(y, m))
    y = conv_folded(y, depth, k2, valid=False) * m
    return dense_instance_norm_masked(y, m)


def block_chain(x5, idx, grid, bs, k1, k2):
    blocks = block_gather(x5, idx, grid, bs)
    nb = neighbor_positions(idx, grid)
    y = block_conv(halo_exchange(blocks, nb), k1)
    y = jax.nn.leaky_relu(block_instance_norm(y))
    y = block_conv(halo_exchange(y, nb), k2)
    y = block_instance_norm(y)
    return block_scatter(y, idx, grid, bs)


# ------------------------------------------------------------------- harness
def make_case(rng, B, grid, bs, C, K, dtype):
    gz, gy, gx = grid
    Z, Y, X = gz * bs, gy * bs, gx * bs
    n = gz * gy * gx
    idx = np.stack([np.sort(rng.choice(n, K, replace=False))
                    for _ in range(B)]).astype(np.int32)
    active = np.zeros((B, n), bool)
    for b in range(B):
        active[b, idx[b]] = True
    x = rng.rand(B, Z, Y, X, C).astype(np.float32)
    # zero the inactive blocks (the student input is masked)
    xb = x.reshape(B, gz, bs, gy, bs, gx, bs, C)
    act = active.reshape(B, gz, 1, gy, 1, gx, 1, 1)
    x = (xb * act).reshape(B, Z, Y, X, C)
    m_full = np.broadcast_to(act, xb.shape[:-1] + (1,)).reshape(
        B, Z, Y, X, 1)
    return (jnp.asarray(x, dtype), jnp.asarray(idx),
            jnp.asarray(m_full.astype(np.float32)))


def timeit(f, args, iters=6):
    jf = jax.jit(f)
    out = jf(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def timegrad(f, argnums, args, iters=6):
    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss, argnums=argnums))
    out = g(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)

    # exactness at a small shape (f32)
    B, grid, bs, C, K = 2, (3, 3, 4), 4, 3, 14
    x, idx, m = make_case(rng, B, grid, bs, C, K, jnp.float32)
    k1 = jnp.asarray(rng.rand(3, 3, 3, C, C) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.rand(3, 3, 3, C, C) * 0.2, jnp.float32)
    for b in range(B):
        xf = x[b].reshape(x.shape[1], *x.shape[2:])[None][0]  # (Z, Y, X, C)
        # dense path folded on z with batch 1
        ref = dense_chain(xf.reshape(x.shape[1], x.shape[2], x.shape[3], C),
                          x.shape[1], m[b], k1, k2)
        got = block_chain(x[b:b + 1], idx[b:b + 1], grid, bs, k1, k2)[0]
        err = float(jnp.max(jnp.abs(got * m[b] - ref * m[b])))
        scale = float(jnp.max(jnp.abs(ref)) + 1e-8)
        print(json.dumps({"sample": b, "abs_err": err, "rel": err / scale}),
              flush=True)
        assert err / scale < 1e-4, (b, err, scale)
    print(json.dumps({"parity": "ok"}), flush=True)

    if os.environ.get("PROBE_TIMING", "1") != "1":
        return

    # bench stage-0 workload: patch (112,112,128), blocks 16^3, grid (7,7,8),
    # K = len_keep = round(392*0.4) = 157, C = 32, bf16
    B, grid, bs, C, K = 4, (7, 7, 8), 16, 32, 157
    x, idx, m = make_case(rng, B, grid, bs, C, K, jnp.bfloat16)
    k1 = jnp.asarray(rng.rand(3, 3, 3, C, C) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.rand(3, 3, 3, C, C) * 0.05, jnp.bfloat16)
    D = x.shape[1]

    def dense_fn(x, k1, k2):
        B_, Z, Y, X, C_ = x.shape
        xf = x.reshape(B_ * Z, Y, X, C_)
        mf = jnp.broadcast_to(m, (B_, Z, Y, X, 1)).reshape(B_ * Z, Y, X, 1)
        y = conv_folded(xf, Z, k1, valid=False) * mf
        y = jax.nn.leaky_relu(_bn_masked_batch(y, mf))
        y = conv_folded(y, Z, k2, valid=False) * mf
        return _bn_masked_batch(y, mf)

    def _bn_masked_batch(xf, mf, eps=1e-5):
        x32 = xf.astype(jnp.float32) * mf
        cnt = mf.sum() * 1.0
        mean = x32.sum((0, 1, 2)) / cnt
        var = jnp.maximum((x32 * x32).sum((0, 1, 2)) / cnt - mean * mean, 0.0)
        a = jax.lax.rsqrt(var + eps)
        return (((xf.astype(jnp.float32) - mean) * a) * mf).astype(xf.dtype)

    def block_fn(x, k1, k2):
        return block_chain(x, idx, grid, bs, k1, k2)

    for name, fn, argn in (("dense", dense_fn, (1, 2)),
                           ("block", block_fn, (1, 2))):
        fwd = timeit(fn, (x, k1, k2))
        bwd = timegrad(fn, argn, (x, k1, k2))
        print(json.dumps({"variant": name, "fwd_ms": round(fwd * 1e3, 2),
                          "fwdbwd_ms": round(bwd * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
