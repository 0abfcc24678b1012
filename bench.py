"""Benchmark: AnatoMask teacher-student pretraining throughput (patches/sec/chip).

Workload matches the reference pretraining constants
(/root/reference/nnunetv2/training/nnUNetTrainer/variants/pretrain/
pretrain_AntoMask.py: STUNet-B encoder head, patch (112,112,128), batch 4,
mask_ratio 0.6, AdamW, grad-clip 12, EMA teacher): per step ONE teacher
forward, guided-mask generation, ONE student forward+backward, optimizer + EMA
update — all fused into a single jitted TPU program, bf16 compute.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by BASELINE_A100_PATCHES_PER_SEC — a provisional estimate
of the reference PyTorch implementation on A100 (the repo publishes no numbers;
see BASELINE.md). Replace with a measured value when available.
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
import optax

# FLOP-derived A100 torch reference baseline (BASELINE.md "Derived A100
# pretraining baseline"; probes/flops_baseline.py): 25.3 TFLOP/step at bs 4,
# 15-25% sustained A100 fp16 utilization => 7.4-12.3 patches/s; midpoint 10.
BASELINE_A100_PATCHES_PER_SEC = 10.0

BATCH = int(os.environ.get("ATK_BENCH_BATCH", "4"))  # reference constant: 4
PATCH = (112, 112, 128)
MEASURE_STEPS = 10  # steps chained inside ONE jitted fori_loop per timed window
# experiment knobs (defaults are the shipped configuration: with whole-stage
# folded execution (ATK_FOLDED=1, round 3) the full bs-4 workload fits 16G HBM
# with NO microbatching and NO remat — measured 6.92 patches/s vs 6.41 at
# MICRO=2/scan and 5.75 pre-folding; PLAN.md)
MICRO_ENV = int(os.environ.get("ATK_BENCH_MICRO", "1"))
REMAT_ENV = os.environ.get("ATK_BENCH_REMAT", "0") == "1"
SCAN_ENV = os.environ.get("ATK_BENCH_SCAN", "1") == "1"


def main():
    from anatomask_tpu.ssl.anatomask import generate_guided_mask
    from anatomask_tpu.ssl.ema import ema_update
    from anatomask_tpu.ssl.pretrain import PretrainConfig, build_spark_model, no_decay_mask
    from anatomask_tpu.ssl.spark import spark_loss

    cfg = PretrainConfig(
        method="anatomask", model_size="B", patch_size=PATCH, batch_size=BATCH,
        mask_ratio=0.6, compute_dtype="bfloat16", remat=REMAT_ENV,
    )
    model = build_spark_model(cfg, in_channels=1)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(rng, x0, model.mask(rng, 1))["params"]
    ema_params = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True), params)
    optimizer = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.adamw(1e-4, weight_decay=1e-5, mask=no_decay_mask(params)),
    )
    opt_state = optimizer.init(params)
    L = int(np.prod(model.fmap))
    len_loss = max(1, int((L - model.len_keep) * 0.25))

    # Every norm in the pretraining path is per-sample (InstanceNorm), so
    # microbatch gradient accumulation is EXACTLY the bs-4 gradient; it halves
    # the activation peak so the full reference workload fits 16G HBM.
    MICRO = MICRO_ENV

    def micro_grads(params, ema_params, rng, x):
        k1, k2 = jax.random.split(rng)
        mask1 = model.mask(k1, x.shape[0])
        inp1, rec1 = model.apply({"params": jax.lax.stop_gradient(ema_params)}, x, mask1)
        _, loss_map = spark_loss(inp1, rec1, mask1)
        hard, _ = generate_guided_mask(k2, loss_map, model.fmap, model.len_keep, len_loss)

        def loss_fn(p):
            inp, rec = model.apply({"params": p}, x, hard)
            return spark_loss(inp, rec, hard)[0]

        return jax.value_and_grad(loss_fn)(params)

    def train_step(params, ema_params, opt_state, rng, x):
        keys = jax.random.split(rng, MICRO)
        mb = BATCH // MICRO
        if SCAN_ENV and MICRO > 1:
            # lax.scan FORCES sequential microbatch execution, so only one
            # microbatch's activations are live at a time (the unrolled form
            # lets XLA interleave them and blow HBM in noremat mode)
            xs = x.reshape(MICRO, mb, *x.shape[1:])

            def body(acc, inp):
                k_i, xb = inp
                loss_i, g_i = micro_grads(params, ema_params, k_i, xb)
                return jax.tree_util.tree_map(jnp.add, acc, g_i), loss_i

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads, losses = jax.lax.scan(body, zeros, (keys, xs))
            losses = list(losses)
        else:
            grads = None
            losses = []
            for i in range(MICRO):  # unrolled
                xb = x[i * mb:(i + 1) * mb]
                loss_i, g_i = micro_grads(params, ema_params, keys[i], xb)
                grads = g_i if grads is None else jax.tree_util.tree_map(jnp.add, grads, g_i)
                losses.append(loss_i)
        grads = jax.tree_util.tree_map(lambda g: g / MICRO, grads)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = ema_update(ema_params, new_params, 0.999)
        return new_params, new_ema, new_opt, jnp.mean(jnp.stack(losses))

    # --- tunnel-proof measured region (round 4) ---
    # The axon tunnel's per-dispatch latency is SESSION-VARIABLE (30-60+ ms);
    # timing MEASURE_STEPS host-dispatched step() calls (plus a
    # jax.random.split dispatch each) exposed the scoreboard number to it
    # (BENCH_r03 4.878 vs builder-measured 7.8 with identical code). The fix
    # is the discipline CLAUDE.md mandates for probes: chain ALL measured
    # steps inside ONE jitted lax.fori_loop with the rng folded into the
    # carry, so the whole measurement is a single dispatch + ONE scalar
    # readback, amortizing tunnel latency to <1% of the measured window.
    # opt-in XLA compiler-option overrides (probe lever, e.g.
    # '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'); shipped default: none
    _copts = os.environ.get("ATK_BENCH_COMPILER_OPTS")
    _jit_kw = dict(compiler_options=json.loads(_copts)) if _copts else {}

    @functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1, 2),
                       **_jit_kw)
    def run_chain(params, ema_params, opt_state, rng, x, n_steps):
        def body(i, carry):
            params, ema_params, opt_state, rng, _ = carry
            rng, sub = jax.random.split(rng)
            params, ema_params, opt_state, loss = train_step(
                params, ema_params, opt_state, sub, x)
            return (params, ema_params, opt_state, rng,
                    loss.astype(jnp.float32))
        init = (params, ema_params, opt_state, rng, jnp.zeros((), jnp.float32))
        return jax.lax.fori_loop(0, n_steps, body, init)

    data = jax.device_put(
        jnp.asarray(np.random.rand(BATCH, *PATCH, 1), dtype=jnp.bfloat16))

    # warmup invocation compiles the chained program and runs MEASURE_STEPS
    # real steps (same compiled executable is then timed)
    rng, sub = jax.random.split(rng)
    params, ema_params, opt_state, rng, loss = run_chain(
        params, ema_params, opt_state, sub, data, MEASURE_STEPS)
    float(loss)  # host readback: block_until_ready does not synchronize on axon

    t0 = time.perf_counter()
    params, ema_params, opt_state, rng, loss = run_chain(
        params, ema_params, opt_state, rng, data, MEASURE_STEPS)
    final_loss = float(loss)  # forces completion of the whole chained sequence
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    # secondary diagnostic: a second timed invocation to expose run-to-run
    # spread inside the same session (stderr only; stdout stays one JSON line)
    t1 = time.perf_counter()
    params, ema_params, opt_state, rng, loss = run_chain(
        params, ema_params, opt_state, rng, data, MEASURE_STEPS)
    float(loss)
    dt2 = time.perf_counter() - t1
    print(f"[bench] chained window 1: {dt:.3f}s  window 2: {dt2:.3f}s "
          f"({MEASURE_STEPS} steps each; spread "
          f"{abs(dt - dt2) / min(dt, dt2) * 100:.1f}%)", file=sys.stderr)
    # round-5 (advisor): report the MEAN of the two full-work windows (= median
    # for n=2) rather than the min, and publish both window times in the JSON so
    # the spread is visible to the driver. Window spread is ~0.1% in-session, so
    # this is a reporting change, not a protocol change.
    dt_mean = (dt + dt2) / 2.0

    patches_per_sec = MEASURE_STEPS * BATCH / dt_mean
    print(json.dumps({
        "metric": "anatomask_pretrain_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 3),
        "unit": f"CT patches/sec/chip (STUNet-B, patch 112x112x128, bs {BATCH}, bf16)",
        "vs_baseline": round(patches_per_sec / BASELINE_A100_PATCHES_PER_SEC, 3),
        "window_s": [round(dt, 3), round(dt2, 3)],
        "steps_per_window": MEASURE_STEPS,
    }))


if __name__ == "__main__":
    main()
