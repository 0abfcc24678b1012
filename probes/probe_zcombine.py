"""z-tap combine formulation shootout (stage level, hot bench shapes).

The zconcat lowering's tap combine (shift_folded_rows: roll + boundary-mask
+ add over the (N, H, W, kz*F) conv output) is a separate full-bandwidth
pass per conv that lands in XLA's loop-fusion emitter — which the rowstats
probe measured at only 135-335 GB/s. Candidate reformulations:

  a) shipped      — conv3d_zconcat_folded (roll + where + add)
  b) combine_conv — express the tap combine as ONE fixed-kernel conv over
                    the 5D view: y.reshape(B, D, H*W, kz*F) conv kernel
                    (3, 1, kz*F, F) with kernel[dz, 0, dz*F+f, f] = 1 and
                    z padding (1, 1). The zero-padding rows reproduce the
                    sample-boundary masks exactly; the combine rides the
                    conv pipeline (MXU streaming) instead of loop fusion.
                    Extra MACs are F-fold but tiny vs the main conv.
  c) input_concat — z-shifted channel concat on the INPUT (one conv with
                    kz*C input channels, no post-combine at all).

All are exact re-associations of the same sums. Timed per CLAUDE.md
(chained fori_loop, one-element readback) as a 2-conv stage
(conv -> IN -> lrelu -> conv -> IN -> lrelu) fwd and fwd+bwd, because the
combine's cost shows up in how it fuses with its neighbors.

Run on the real TPU: python probes/probe_zcombine.py
"""
import functools
import json
import os
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from anatomask_tpu.ops.conv_lowering import (conv3d_zconcat_folded,
                                             shift_folded_rows)


def timeit(step, x0, iters=10):
    """Chained fori_loop timing: `step` maps the carry x -> next x, so each
    iteration DEPENDS on the previous one (a body that ignores the carry is
    loop-invariant and XLA hoists it — the first run of this probe measured
    fwd+bwd "faster" than fwd that way)."""
    @jax.jit
    def chain(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c)

    r = chain(x0)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    r = chain(x0)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def conv_zconcat_shipped(xf, depth, kernel):
    return conv3d_zconcat_folded(xf, depth, kernel, (1, 1, 1),
                                 ((1, 1), (1, 1), (1, 1)))


def conv_zconcat_combineconv(xf, depth, kernel):
    """zconcat conv, tap combine as a fixed-kernel (3,1) conv over (D, H*W)."""
    kz = kernel.shape[0]
    F = kernel.shape[4]
    w_all = jnp.concatenate([kernel[dz] for dz in range(kz)], axis=-1)
    y = jax.lax.conv_general_dilated(
        xf, w_all, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h, w, _ = y.shape
    b = n // depth
    # fixed selection kernel: out[f] += y[z + dz - 1, dz*F + f]
    # combine-conv tap index runs OPPOSITE to the data shift direction:
    # conv tap t reads input row z + t - 1, and tap dz of the MAIN conv
    # (weight kernel[dz], z-offset dz - pz0) must come from that row, so
    # t = dz - 1 + 1 = dz maps 1:1 here (kz == 3, pz0 == 1).
    sel = np.zeros((kz, 1, kz * F, F), np.float32)
    for dz in range(kz):
        sel[dz, 0, dz * F:(dz + 1) * F, :] = np.eye(F)
    sel = jax.lax.stop_gradient(jnp.asarray(sel, y.dtype))
    y5 = y.reshape(b, depth, h * w, kz * F)
    out = jax.lax.conv_general_dilated(
        y5, sel, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(n, h, w, F)


def conv_zconcat_inputconcat(xf, depth, kernel):
    """z-shifted channel concat on the input; one conv, no post-combine."""
    kz = kernel.shape[0]
    C = kernel.shape[3]
    # tap dz reads input row z + dz - pz0 (pz0 = 1)
    xs = jnp.concatenate(
        [shift_folded_rows(xf, dz - 1, depth) for dz in range(kz)], axis=-1)
    # weight: stack taps along the INPUT-channel dim -> (ky, kx, kz*C, F)
    w_in = jnp.concatenate([kernel[dz] for dz in range(kz)], axis=2)
    return jax.lax.conv_general_dilated(
        xs, w_in, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def instnorm_folded(x, depth):
    b = x.shape[0] // depth
    c = x.shape[-1]
    s = jnp.sum(x, (1, 2), dtype=jnp.float32).reshape(b, depth, c).sum(1)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), (1, 2)).reshape(b, depth, c).sum(1)
    cnt = depth * x.shape[1] * x.shape[2]
    mean = s / cnt
    var = jnp.maximum(ss / cnt - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + 1e-5)
    mean_r = jnp.repeat(mean, depth, 0)[:, None, None, :]
    scale_r = jnp.repeat(scale, depth, 0)[:, None, None, :]
    return ((x.astype(jnp.float32) - mean_r) * scale_r).astype(x.dtype)


def make_stage(conv_fn, depth, k1, k2):
    def stage(xf, k1, k2):
        y = conv_fn(xf, depth, k1)
        y = jax.nn.leaky_relu(instnorm_folded(y, depth), 0.01)
        y = conv_fn(y, depth, k2)
        y = jax.nn.leaky_relu(instnorm_folded(y, depth), 0.01)
        return y

    # C == F for every probed shape, so the stage output chains as the next
    # input (IN + lrelu keeps magnitudes bounded across iterations).
    def fwd_step(xc):
        return stage(xc, k1, k2)

    def fwdbwd_step(xc):
        def loss(k1_, k2_):
            return jnp.sum(stage(xc, k1_, k2_).astype(jnp.float32) ** 2) * 1e-9
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(k1, k2)
        sig = (l + g[0].ravel()[0] + g[1].ravel()[0]).astype(xc.dtype)
        # data-dependent no-op perturbation: forces the loop-carried
        # dependency without changing xc (1 + tiny rounds to 1 in bf16)
        return xc * (1 + sig * 1e-24)

    return stage, fwd_step, fwdbwd_step


VARIANTS = {
    "shipped": conv_zconcat_shipped,
    "combine_conv": conv_zconcat_combineconv,
    "input_concat": conv_zconcat_inputconcat,
}

# (name, folded shape (B*D, H, W, C), depth, F)
if os.environ.get("ATK_PROBE_SMOKE", "0") == "1":  # CPU exactness smoke
    SHAPES = [("smoke", (2 * 6, 8, 10, 4), 6, 4)]
else:
    SHAPES = [
        ("enc0", (4 * 112, 112, 128, 32), 112, 32),
        ("dec3", (4 * 112, 112, 128, 32), 112, 32),   # LightDecoder top stage
        ("dec3_64", (4 * 112, 112, 128, 64), 112, 64),
    ]


def main():
    print(jax.devices())
    results = {}
    rng = np.random.RandomState(0)
    for name, shape, depth, F in SHAPES:
        n, h, w, c = shape
        x = jnp.asarray(rng.rand(*shape).astype(np.float32) - 0.5,
                        dtype=jnp.bfloat16)
        k1 = jnp.asarray(rng.randn(3, 3, 3, c, F).astype(np.float32) * 0.05,
                         dtype=jnp.bfloat16)
        k2 = jnp.asarray(rng.randn(3, 3, 3, F, F).astype(np.float32) * 0.05,
                         dtype=jnp.bfloat16)
        ref = None
        for vname, conv_fn in VARIANTS.items():
            stage, fwd_step, fwdbwd_step = make_stage(conv_fn, depth, k1, k2)
            try:
                out = np.asarray(jax.jit(stage)(x, k1, k2), np.float32)
                if ref is None:
                    ref = out
                else:
                    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)
                t_f = timeit(fwd_step, x)
                t_fb = timeit(fwdbwd_step, x)
            except Exception as e:  # HBM OOM at the biggest shape etc.
                print(json.dumps({"shape": name, "variant": vname,
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(json.dumps({"shape": name, "variant": vname,
                              "fwd_ms": round(t_f, 2),
                              "fwdbwd_ms": round(t_fb, 2)}), flush=True)
            results[f"{name}/{vname}"] = {"fwd": t_f, "fwdbwd": t_fb}
    with open("probes/zcombine_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
