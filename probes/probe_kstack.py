"""Probe: raise conv MXU utilization by stacking ky taps into INPUT channels.

The z-concat lowering runs ONE 2D conv with K (contraction) = C_in. At the
hot shapes C_in is 32/64 — only 25-50%% of the 128-wide MXU K dimension. This
probe measures the "k-stack" variant: materialize xc = concat of the 3
H-shifted copies (C -> 3C), reshape the kernel to (1, 3, 3C, kz*F), so the
conv contracts over K = 3C (96/192) — at the cost of writing/reading a 3x
input copy.

Timing discipline per CLAUDE.md: chained fori_loop, one-element readback.
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


def zconcat_conv(xf, depth, kernel):
    """Current: one 2D conv, K=C, output channels kz*F, z-combine by rolls."""
    kz, ky, kx, C, F = kernel.shape
    w_all = jnp.concatenate([kernel[dz] for dz in range(kz)], axis=-1)
    y = jax.lax.conv_general_dilated(
        xf, w_all, (1, 1), ((ky // 2, ky // 2), (kx // 2, kx // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zidx = jnp.arange(xf.shape[0]) % depth
    out = None
    for dz in range(kz):
        yb = y[:, :, :, dz * F:(dz + 1) * F]
        shift = dz - kz // 2
        if shift:
            valid = ((zidx + shift) >= 0) & ((zidx + shift) < depth)
            yb = jnp.where(valid[:, None, None, None],
                           jnp.roll(yb, -shift, axis=0), 0)
        out = yb if out is None else out + yb
    return out


def kstack_conv(xf, depth, kernel):
    """y-taps stacked into input channels: xc (N, H, W, 3C); conv (1, kx) with
    K = 3C, output kz*F; same z-combine."""
    kz, ky, kx, C, F = kernel.shape
    N, H, W, _ = xf.shape
    pad = ky // 2
    xp = jnp.pad(xf, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    xc = jnp.concatenate([xp[:, dy:dy + H] for dy in range(ky)], axis=-1)
    # kernel (kz, ky, kx, C, F) -> (1, kx, ky*C, kz*F); input channel block dy
    # must multiply tap dy
    w = kernel.transpose(2, 1, 3, 0, 4).reshape(kx, ky * C, kz * F)[None]
    y = jax.lax.conv_general_dilated(
        xc, w, (1, 1), ((0, 0), (kx // 2, kx // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zidx = jnp.arange(N) % depth
    out = None
    for dz in range(kz):
        yb = y[:, :, :, dz * F:(dz + 1) * F]
        shift = dz - kz // 2
        if shift:
            valid = ((zidx + shift) >= 0) & ((zidx + shift) < depth)
            yb = jnp.where(valid[:, None, None, None],
                           jnp.roll(yb, -shift, axis=0), 0)
        out = yb if out is None else out + yb
    return out


def zstack_conv(xf, depth, kernel):
    """ALL taps stacked into input channels: xc (N, H, W, 9C) via y-shifts +
    z-rolls; 1x1-in-y conv... here: (1, kx) over (ky*kz*C) would need z rolls
    of the INPUT (kz extra copies). K = kz*ky*C, no z-combine at all."""
    kz, ky, kx, C, F = kernel.shape
    N, H, W, _ = xf.shape
    pad = ky // 2
    zidx = jnp.arange(N) % depth
    parts = []
    for dz in range(kz):
        shift = dz - kz // 2
        xs = xf
        if shift:
            valid = ((zidx + shift) >= 0) & ((zidx + shift) < depth)
            xs = jnp.where(valid[:, None, None, None],
                           jnp.roll(xf, -shift, axis=0), 0)
        xp = jnp.pad(xs, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        for dy in range(ky):
            parts.append(xp[:, dy:dy + H])
    xc = jnp.concatenate(parts, axis=-1)  # (N, H, W, kz*ky*C)
    w = kernel.transpose(2, 0, 1, 3, 4).reshape(kx, kz * ky * C, F)[None]
    return jax.lax.conv_general_dilated(
        xc, w, (1, 1), ((0, 0), (kx // 2, kx // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_fn(fn, args, iters=8):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.asarray(out).ravel()[0])

    def chain(n):
        def body(i, acc):
            r = f(*args)
            return acc + jnp.asarray(r).ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # chained: re-dispatch inside jit not possible with closure call; instead
    # loop python-side and sync once (dispatch overhead ~30ms amortized by
    # iters)
    t0 = time.perf_counter()
    outs = None
    for _ in range(iters):
        outs = f(*args)
    float(jnp.asarray(outs).ravel()[0])
    return (time.perf_counter() - t0) / iters


def time_grad(fn, args, iters=8):
    def loss(*a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 2)))
    out = g(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    cases = [
        ("enc0", (4, 128, 112, 112, 32), 32),   # (B, D, H, W, C) -> F
        ("dec3", (4, 128, 112, 112, 48), 48),
        ("dec2", (4, 64, 56, 56, 96), 96),
    ]
    results = []
    for name, shape, F in cases:
        B, D, H, W, C = shape
        xf = jnp.asarray(rng.rand(B * D, H, W, C), jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, 3, C, F) * 0.1, jnp.bfloat16)
        # exactness check in f32 at small scale
        xs = jnp.asarray(rng.rand(2 * 8, 10, 12, C), jnp.float32)
        ks = jnp.asarray(rng.rand(3, 3, 3, C, F), jnp.float32)
        ref = zconcat_conv(xs, 8, ks)
        for variant, fn in (("kstack", kstack_conv), ("zstack", zstack_conv)):
            got = fn(xs, 8, ks)
            err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
            assert err < 1e-4, (name, variant, err)
        row = {"case": name, "shape": list(shape), "F": F}
        for variant, fn in (("zconcat", zconcat_conv), ("kstack", kstack_conv),
                            ("zstack", zstack_conv)):
            fwd = time_fn(lambda a, d, w: fn(a, d, w), (xf, D, k))
            bwd = time_grad(lambda a, d, w: fn(a, d, w), (xf, D, k))
            row[variant] = {"fwd_ms": round(fwd * 1e3, 2),
                            "fwdbwd_ms": round(bwd * 1e3, 2)}
            print(json.dumps({"case": name, "variant": variant,
                              "fwd_ms": row[variant]["fwd_ms"],
                              "fwdbwd_ms": row[variant]["fwdbwd_ms"]}),
                  flush=True)
        results.append(row)
    with open(os.path.join(os.path.dirname(__file__), "kstack_results.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
