"""Probe 2: reduce data-formatting overhead of the z2d lowering and speed up
ConvTranspose2x.

Variants (dec3/enc0 shapes, bs 4, bf16):
  conv3d: z2d_v1 (pad+slice+fold per tap, current), z2d_v2 (fold once,
  output shift-add), z1slab (3x conv3d with (1,3,3) kernel on z-slices),
  lax native.
  convt:  flax lhs-dilated (current) vs z-decomposed (4x 2D ConvT + z
  interleave).
Times fwd and fwd+bwd(dx+dw) via chained fori_loop (see probe_conv_variants).
"""
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
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c)
    out = run(x0); _sync(out)
    t0 = time.perf_counter()
    out = run(x0); _sync(out)
    dt = (time.perf_counter() - t0) / iters
    rec = {"case": name, "ms": round(dt * 1e3, 3)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 2)
    print(json.dumps(rec), flush=True)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])


def conv3d_lax(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def z2d_v1(x, w):
    from anatomask_tpu.ops.conv_lowering import conv3d_z2d
    return conv3d_z2d(x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)))


def z2d_v2(x, w):
    """Fold once; 3 2D convs on the SAME folded input; shift-add outputs on the
    (major) z axis."""
    Bb, D, H, W, C = x.shape
    co = w.shape[-1]
    xf = x.reshape(Bb * D, H, W, C)
    outs = []
    for dz in range(3):
        y = jax.lax.conv_general_dilated(
            xf, w[dz], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(y.reshape(Bb, D, H, W, co))
    # out[z] = y0[z-1] + y1[z] + y2[z+1]  (tap dz reads slab z + dz - 1)
    z = jnp.zeros((Bb, 1, H, W, co), outs[0].dtype)
    return (jnp.concatenate([z, outs[0][:, :-1]], 1)
            + outs[1]
            + jnp.concatenate([outs[2][:, 1:], z], 1))


def z1slab(x, w):
    """3 conv3d calls with (1,3,3) kernels on z-shifted slices (no fold)."""
    Bb, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = jax.lax.slice_in_dim(xp, dz, dz + D, axis=1)
        y = jax.lax.conv_general_dilated(
            xs, w[dz:dz + 1], (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = y if out is None else out + y
    return out


def convt_flax(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(3, 3)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y[:, 1:-1, 1:-1, 1:-1, :]


def convt_zphase(x, w):
    """ConvT(k4,s2,crop1) z-decomposed: flax semantics out[o] = sum_k w[k] x[j],
    k = 2j - o + 2 (no kernel flip). Phase rz=0 reads z-taps x[i-1] (w[0]),
    x[i] (w[2]); rz=1 reads x[i] (w[1]), x[i+1] (w[3]) — each tap is a 2D
    ConvT over the (B*D)-folded slabs; z interleave on the major axis."""
    Bb, D, H, W, C = x.shape
    co = w.shape[-1]
    xf = x.reshape(Bb * D, H, W, C)

    def convt2d(v, w2d):  # (4,4,C,co) flax-style 2D transpose + crop 1
        y = jax.lax.conv_general_dilated(
            v, w2d, (1, 1), [(3, 3)] * 2, lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, 1:-1, 1:-1, :]

    c = {kz: convt2d(xf, w[kz]).reshape(Bb, D, 2 * H, 2 * W, co) for kz in range(4)}
    z = jnp.zeros((Bb, 1, 2 * H, 2 * W, co), x.dtype)
    # phase 0 at out z=2i: w[0] x[i-1] + w[2] x[i]
    ph0 = jnp.concatenate([z, c[0][:, :-1]], 1) + c[2]
    # phase 1 at out z=2i+1: w[1] x[i] + w[3] x[i+1]
    ph1 = c[1] + jnp.concatenate([c[3][:, 1:], z], 1)
    out = jnp.stack([ph0, ph1], 2)  # (B, D, 2, 2H, 2W, co)
    return out.reshape(Bb, 2 * D, 2 * H, 2 * W, co)


def _fwd_step(f, w, scale=0.1):
    def step(x):
        return f(x, w) * jnp.asarray(scale, DT)
    return step


def _bwd_step(f, w):
    def loss(x, w):
        return (f(x, w).astype(jnp.float32) ** 2).sum() * 1e-6
    g = jax.grad(loss, argnums=(0, 1))
    def step(x):
        gx, gw = g(x, w)
        return x - gx.astype(x.dtype) * jnp.asarray(1e-6, DT)
    return step


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)

    if which in ("all", "conv"):
        for name, res, c in (("dec3", (112, 112, 128), 64),
                             ("enc0", (112, 112, 128), 32)):
            x = jax.random.normal(key, (B, *res, c), DT)
            w = jax.random.normal(key, (3, 3, 3, c, c), DT) * 0.02
            fl = 2 * B * np.prod(res) * 27 * c * c
            for fname, f in (("z2d_v1", z2d_v1), ("z2d_v2", z2d_v2),
                             ("z1slab", z1slab), ("lax", conv3d_lax)):
                # correctness vs lax once (cheap shapes checked on CPU already)
                timeit(f"{fname}_{name}", _fwd_step(f, w), x, flops=fl)
                timeit(f"{fname}_{name}_bwd", _bwd_step(f, w), x, flops=3 * fl)

    if which in ("all", "convt"):
        for name, res, c in (("dec3", (56, 56, 64), 64),
                             ("dec2", (28, 28, 32), 128)):
            x = jax.random.normal(key, (B, *res, c), DT)
            w = jax.random.normal(key, (4, 4, 4, c, c), DT) * 0.02
            y1 = convt_flax(x, w); y2 = convt_zphase(x, w)
            err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
            print(json.dumps({"case": f"convt_zphase_err_{name}", "err": err}), flush=True)
            fl = 2 * B * np.prod(res) * 8 * 8 * c * c

            def down(y):
                return y[:, ::2, ::2, ::2, :]

            timeit(f"convt_flax_{name}", _fwd_step(lambda x, w: down(convt_flax(x, w)), w),
                   x, flops=fl)
            timeit(f"convt_zphase_{name}", _fwd_step(lambda x, w: down(convt_zphase(x, w)), w),
                   x, flops=fl)
            timeit(f"convt_flax_{name}_bwd", _bwd_step(convt_flax, w), x, flops=3 * fl)
            timeit(f"convt_zphase_{name}_bwd", _bwd_step(convt_zphase, w), x, flops=3 * fl)

    print(json.dumps({"case": "done"}), flush=True)


if __name__ == "__main__":
    main()
