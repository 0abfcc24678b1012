"""Probe: ConvTranspose(k4, s2, p1) lowerings measured INSIDE a folded
stride-1 chain (conv3x3 -> ConvT -> conv3x3), the real decoder context.

Round-2 measured the variants in isolation on 5D tensors (z-phase lost to
native, PLAN.md). After whole-stage folding, the native lax.conv_transpose
forces a 5D boundary (fold->unfold->lhs-dilated pads/reverses->refold) that
the step profile shows costing tens of ms; the z-phase variant keeps the
whole chain in the folded layout: each z-phase output is a kz=2 stride-1
conv over z (zconcat-able) combined with a 2D ConvT over (y, x); the two
phase rows interleave by a leading-dims reshape (no shuffle transpose).
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


def convt_native(xf, depth, k):
    """Unfold -> lax.conv_transpose (k4 s2, torch p=1 crop) -> fold."""
    N, H, W, C = xf.shape
    B = N // depth
    x5 = xf.reshape(B, depth, H, W, C)
    y = jax.lax.conv_transpose(x5, k, (2, 2, 2), "VALID",
                               dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = y[:, 1:-1, 1:-1, 1:-1, :]
    return y.reshape(B * 2 * depth, *y.shape[2:])


def convt_zphase(xf, depth, k):
    """z-phase decomposition, fully folded.

    out[2z+phi] = sum_{dz in taps(phi)} ConvT2D_{y,x}(w[kz_tap]) applied to
    input row (z + offset). For k=4, s=2, p=1 along z: output row 2z+phi
    draws from kernel z-taps t with (2z+phi) = 2*(z_in) - 1 + t, i.e. taps
    t = phi+1 (z_in = z) and t = phi+3 (z_in = z-1... sign conventions
    verified against lax.conv_transpose in the parity check below)."""
    N, H, W, C = xf.shape
    F = k.shape[4]
    zidx = jnp.arange(N) % depth

    def shift_rows(x, s):
        # x[n] <- x[n + s] within each sample, zeros outside
        if s == 0:
            return x
        valid = ((zidx + s) >= 0) & ((zidx + s) < depth)
        return jnp.where(valid[:, None, None, None], jnp.roll(x, -s, axis=0), 0)

    def convt2d(x, w2):
        # w2: (4, 4, C, F) ConvT over (H, W) with torch p=1 crop
        y = jax.lax.conv_transpose(x, w2, (2, 2), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, 1:-1, 1:-1, :]

    phases = []
    for phi in (0, 1):
        acc = None
        for t in range(4):
            # lax.conv_transpose applies MIRRORED z-taps: effective tap
            # te = 3 - t; out_z = 2*in_z - 1 + te => in_z offset
            # (phi + 1 - te)/2, valid when even (verified exact below)
            te = 3 - t
            if (phi + 1 - te) % 2 != 0:
                continue
            off = (phi + 1 - te) // 2
            xs = shift_rows(xf, off)
            y = convt2d(xs, k[t])
            acc = y if acc is None else acc + y
        phases.append(acc)
    # interleave phases along z: row z -> rows (2z, 2z+1)
    y = jnp.stack(phases, axis=1)  # (N, 2, H', W', F)
    return y.reshape(N * 2, *y.shape[2:])


def convt_subpix_folded(xf, depth, k):
    from anatomask_tpu.ops.subpixel import conv_transpose_4_2_1_folded
    return conv_transpose_4_2_1_folded(xf, depth, k)


def chain(convt_fn):
    def f(xf, depth, k1, kt, k2):
        h = conv3d_zconcat_folded(xf, depth, k1, (1, 1, 1), ((1, 1),) * 3)
        h = jax.nn.relu(h)
        h = convt_fn(h, depth, kt)
        h = conv3d_zconcat_folded(h, 2 * depth, k2, (1, 1, 1), ((1, 1),) * 3)
        return jax.nn.relu(h)
    return f


def timeit(f, args, iters=6):
    # depth (arg 1) selects reshape shapes — must be static under jit
    jf = jax.jit(f, static_argnums=(1,))
    out = jf(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def timegrad(f, args, iters=6):
    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss, argnums=(0, 2, 3, 4)), static_argnums=(1,))
    out = g(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    # parity on CPU-sized shapes first
    C, F = 6, 5
    xf = jnp.asarray(rng.rand(2 * 6, 8, 10, C), jnp.float32)
    kt = jnp.asarray(rng.rand(4, 4, 4, C, F) * 0.2, jnp.float32)
    ref = convt_native(xf, 6, kt)
    got = convt_zphase(xf, 6, kt)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    got_sp = convt_subpix_folded(xf, 6, kt)
    err_sp = float(jnp.max(jnp.abs(got_sp - ref)) / jnp.max(jnp.abs(ref)))
    print(json.dumps({"parity_relerr": err, "parity_relerr_subpix": err_sp}),
          flush=True)
    assert err < 1e-4 and err_sp < 1e-4

    # hot decoder stage: 56 -> 112 at 64 -> 32 channels (LightDecoder dec3 up)
    B, D, H, W, C, F = 4, 64, 56, 56, 96, 96
    xh = jnp.asarray(rng.rand(B * D, H, W, C), jnp.bfloat16)
    k1 = jnp.asarray(rng.rand(3, 3, 3, C, C) * 0.05, jnp.bfloat16)
    kt = jnp.asarray(rng.rand(4, 4, 4, C, F // 2) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.rand(3, 3, 3, F // 2, F // 2) * 0.05, jnp.bfloat16)
    for name, fn in (("native", convt_native), ("zphase", convt_zphase),
                     ("subpix_folded", convt_subpix_folded)):
        cf = chain(fn)
        fwd = timeit(cf, (xh, D, k1, kt, k2))
        bwd = timegrad(cf, (xh, D, k1, kt, k2))
        print(json.dumps({"variant": name, "fwd_ms": round(fwd * 1e3, 2),
                          "fwdbwd_ms": round(bwd * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
