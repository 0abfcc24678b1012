"""TPU probe: candidate formulations for the hot 3D convs in the AnatoMask
pretrain step (see PLAN.md round-2). Times, per variant, fwd and fwd+bwd.

Variants:
  A. lax conv3d baseline at hot shapes (enc0/dec3/dec2).
  B. z-decomposed conv3d = sum of 3 conv2d over z-shifts (exact).
  C. ConvTranspose k4 s2 p1: flax baseline vs exact phase-conv rewrite
     (conv k2 stride1 -> 8*C_out channels -> depth-to-space).
  D. block-sparse stage0: gather active 16^3 blocks (+1 halo) -> VALID conv ->
     scatter, vs dense masked conv.

Run on the real TPU, one process at a time. Prints one JSON line per case.
"""
import functools
import json
import os
import sys
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
B = 4


def timeit(name, step, x0, flops=None, iters=10):
    """step: carry -> carry (same pytree structure). Runs `iters` chained
    repetitions INSIDE one jitted program (per-call dispatch through the axon
    tunnel costs seconds, so independent per-call timing is useless)."""

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c)

    out = run(x0)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    out = run(x0)
    _sync(out)
    dt = (time.perf_counter() - t0 - _call_overhead()) / iters
    rec = {"case": name, "ms": round(dt * 1e3, 3)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 2)
    print(json.dumps(rec), flush=True)
    return dt


_OVERHEAD = [None]


def _call_overhead():
    """One-call dispatch+readback overhead (measured once with a trivial op)."""
    if _OVERHEAD[0] is None:
        f = jax.jit(lambda x: x + 1.0)
        y = jnp.zeros((8, 128), jnp.float32)
        y = f(y); _sync(y)
        t0 = time.perf_counter()
        y = f(y); _sync(y)
        _OVERHEAD[0] = time.perf_counter() - t0
        print(json.dumps({"case": "dispatch_overhead", "ms": round(_OVERHEAD[0] * 1e3, 2)}),
              flush=True)
    return _OVERHEAD[0]


def _sync(out):
    # host readback of ONE element (axon: block_until_ready doesn't sync, and
    # np.asarray(full array) would drag the whole buffer through the tunnel)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_valid(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_z2d(x, w):
    """3D 3x3x3 conv as 3 z-shifted 2D 3x3 convs (exact)."""
    bsz, d, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = jax.lax.dynamic_slice_in_dim(xp, dz, d, axis=1)
        xs2 = xs.reshape(bsz * d, h, wd, c)
        y = jax.lax.conv_general_dilated(
            xs2, w[dz], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out.reshape(bsz, d, h, wd, co)


def convt_flax(x, w):
    """ConvTranspose k4 s2, torch p=1 semantics (crop 1 each side) — same
    lowering as ssl/decoder.py ConvTranspose2x (flax VALID transpose = conv
    with lhs_dilation 2 and full padding, no kernel flip)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(3, 3)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y[:, 1:-1, 1:-1, 1:-1, :]


def make_convt_phase_weights(w):
    """flax ConvTranspose (no kernel flip) k4 s2 + crop1: out[o] = sum_k w[k]
    x[j], k = 2j - o + 2. Phase r (o=2i+r): r=0 reads x[i-1] (w[0]), x[i]
    (w[2]) at window j'=i; r=1 reads x[i] (w[1]), x[i+1] (w[3]) at window
    j'=i+1. => k2-kernel W2[t, cin, r, cout] = w[2t + r]."""
    cin, cout = w.shape[3], w.shape[4]
    wp = jnp.zeros((2, 2, 2, cin, 2, 2, 2, cout), w.dtype)
    for t1 in range(2):
        for t2 in range(2):
            for t3 in range(2):
                for r1 in range(2):
                    for r2 in range(2):
                        for r3 in range(2):
                            wp = wp.at[t1, t2, t3, :, r1, r2, r3, :].set(
                                w[2 * t1 + r1, 2 * t2 + r2, 2 * t3 + r3])
    return wp.reshape(2, 2, 2, cin, 8 * cout)


def convt_phase(x, w):
    """Exact ConvT(k4,s2,p1) as one k2 VALID conv (8*Cout channels) on a
    (1,1)-padded input + offset interleave. Contraction dim 8*cin -> MXU."""
    cout = w.shape[4]
    wp = make_convt_phase_weights(w)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xpad, wp, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    bsz, d1, h1, w1, _ = y.shape  # (B, D+1, H+1, W+1, 8*cout)
    d, h, wd = d1 - 1, h1 - 1, w1 - 1
    y = y.reshape(bsz, d1, h1, w1, 2, 2, 2, cout)
    # phase r reads window j = i + r  ->  slice [r : dim + r]
    out = jnp.zeros((bsz, d, 2, h, 2, wd, 2, cout), y.dtype)
    for r1 in range(2):
        for r2 in range(2):
            for r3 in range(2):
                sl = y[:, r1:d + r1, r2:h + r2, r3:wd + r3, r1, r2, r3, :]
                out = out.at[:, :, r1, :, r2, :, r3, :].set(sl)
    return out.reshape(bsz, 2 * d, 2 * h, 2 * wd, cout)


def make_block_sparse_stage0(K, bs=16, grid=(7, 7, 8), res=(112, 112, 128), C=32):
    """gather active blocks (+halo) -> VALID conv -> scatter."""
    f1, f2, f3 = grid

    def fn(x, w, idx):  # idx: (B, K, 3) block coords
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

        def slice_one(xb, i3):
            return jax.lax.dynamic_slice(
                xb, (i3[0] * bs, i3[1] * bs, i3[2] * bs, 0), (bs + 2, bs + 2, bs + 2, C))

        blocks = jax.vmap(lambda xb, ib: jax.vmap(lambda i3: slice_one(xb, i3))(ib))(xp, idx)
        blocks = blocks.reshape(x.shape[0] * K, bs + 2, bs + 2, bs + 2, C)
        y = conv3d_valid(blocks, w)
        co = y.shape[-1]
        y = y.reshape(x.shape[0], K, bs, bs, bs, co)
        flat = idx[..., 0] * (f2 * f3) + idx[..., 1] * f3 + idx[..., 2]  # (B, K)
        out = jnp.zeros((x.shape[0], f1 * f2 * f3, bs, bs, bs, co), y.dtype)
        out = out.at[jnp.arange(x.shape[0])[:, None], flat].set(y)
        out = out.reshape(x.shape[0], f1, f2, f3, bs, bs, bs, co)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            x.shape[0], f1 * bs, f2 * bs, f3 * bs, co)
        return out

    return fn


def _fwd_step(f, w, scale=0.1):
    """carry x -> normalized f(x, w) with the same shape (requires cin==cout
    and same-resolution output)."""
    def step(x):
        y = f(x, w)
        return y * jnp.asarray(scale, y.dtype)
    return step


def _bwd_step(f, w):
    """carry x -> x - eps * d sum(f(x,w)) / dx (forces fwd+bwd each iter)."""
    g = jax.grad(lambda x: f(x, w).astype(jnp.float32).sum())
    def step(x):
        return x - jnp.asarray(1e-6, x.dtype) * g(x).astype(x.dtype)
    return step


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)

    shapes = {
        # name: (res, cin==cout)
        "enc0": ((112, 112, 128), 32),
        "dec3": ((112, 112, 128), 64),
        "dec2": ((56, 56, 64), 128),
    }

    if which in ("all", "conv"):
        for name, (res, c) in shapes.items():
            x = jax.random.normal(key, (B, *res, c), DT)
            w = jax.random.normal(key, (3, 3, 3, c, c), DT) * 0.02
            fl = 2 * B * np.prod(res) * 27 * c * c
            timeit(f"lax_conv3d_{name}", _fwd_step(conv3d, w), x, flops=fl)
            timeit(f"z2d_conv3d_{name}", _fwd_step(conv3d_z2d, w), x, flops=fl)
            timeit(f"lax_conv3d_{name}_bwd", _bwd_step(conv3d, w), x, flops=3 * fl)
            timeit(f"z2d_conv3d_{name}_bwd", _bwd_step(conv3d_z2d, w), x, flops=3 * fl)

    if which in ("all", "convt"):
        for name, res, c in (("dec3", (56, 56, 64), 64), ("dec1", (14, 14, 16), 256),
                             ("dec0", (7, 7, 8), 512)):
            x = jax.random.normal(key, (B, *res, c), DT)
            w = jax.random.normal(key, (4, 4, 4, c, c), DT) * 0.02

            def down(y):  # (2D,2H,2W,c) -> (D,H,W,c) so the carry closes
                return y[:, ::2, ::2, ::2, :]

            fl = 2 * B * np.prod(res) * 8 * 8 * c * c  # 8x out vox, 8 taps avg
            timeit(f"convt_flax_{name}",
                   _fwd_step(lambda x, w: down(convt_flax(x, w)), w), x, flops=fl)
            timeit(f"convt_phase_{name}",
                   _fwd_step(lambda x, w: down(convt_phase(x, w)), w), x, flops=fl)
            timeit(f"convt_flax_{name}_bwd",
                   _bwd_step(convt_flax, w), x, flops=3 * fl)
            timeit(f"convt_phase_{name}_bwd",
                   _bwd_step(convt_phase, w), x, flops=3 * fl)

    if which in ("all", "bsparse"):
        K = 157  # len_keep at mask 0.6, fmap 7x7x8
        res, C = (112, 112, 128), 32
        x = jax.random.normal(key, (B, *res, C), DT)
        w = jax.random.normal(key, (3, 3, 3, C, C), DT) * 0.02
        idx_np = np.stack([np.stack(np.unravel_index(
            np.random.default_rng(s).permutation(7 * 7 * 8)[:K], (7, 7, 8)), -1)
            for s in range(B)])
        idx = jnp.asarray(idx_np, jnp.int32)
        fn = make_block_sparse_stage0(K, C=C)
        fl_sparse = 2 * B * K * 16 ** 3 * 27 * C * C
        fl_dense = 2 * B * np.prod(res) * 27 * C * C
        bsp = lambda x, w: fn(x, w, idx)
        timeit("bsparse_stage0_fwd", _fwd_step(bsp, w), x, flops=fl_sparse)
        timeit("dense_stage0_fwd", _fwd_step(conv3d, w), x, flops=fl_dense)
        timeit("bsparse_stage0_bwd", _bwd_step(bsp, w), x, flops=3 * fl_sparse)
        timeit("dense_stage0_bwd", _bwd_step(conv3d, w), x, flops=3 * fl_dense)

    print(json.dumps({"case": "done"}), flush=True)


if __name__ == "__main__":
    main()
