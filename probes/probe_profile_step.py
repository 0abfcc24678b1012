"""Capture a jax.profiler trace of the bench training step and aggregate
device time per op category. Run on the real TPU."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/atk_trace"


def main():
    from anatomask_tpu.ssl.anatomask import generate_guided_mask
    from anatomask_tpu.ssl.ema import ema_update
    from anatomask_tpu.ssl.pretrain import PretrainConfig, build_spark_model, no_decay_mask
    from anatomask_tpu.ssl.spark import spark_loss

    BATCH, PATCH = 4, (112, 112, 128)
    MICRO = int(os.environ.get("PROBE_MICRO", "1"))  # bench default (PLAN.md)
    cfg = PretrainConfig(method="anatomask", model_size="B", patch_size=PATCH,
                         batch_size=BATCH, mask_ratio=0.6,
                         compute_dtype="bfloat16", remat=False)
    model = build_spark_model(cfg, in_channels=1)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(rng, x0, model.mask(rng, 1))["params"]
    ema_params = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True), params)
    optimizer = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.adamw(1e-4, weight_decay=1e-5, mask=no_decay_mask(params)))
    opt_state = optimizer.init(params)
    L = int(np.prod(model.fmap))
    len_loss = max(1, int((L - model.len_keep) * 0.25))

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
        # mirror bench.py's shipped config (MICRO=1 direct; else scanned)
        if MICRO == 1:
            loss, grads = micro_grads(params, ema_params, rng, x)
            losses = [loss]
        else:
            keys = jax.random.split(rng, MICRO)
            xs = x.reshape(MICRO, BATCH // MICRO, *x.shape[1:])

            def body(acc, inp):
                k_i, xb = inp
                loss_i, g_i = micro_grads(params, ema_params, k_i, xb)
                return jax.tree_util.tree_map(jnp.add, acc, g_i), loss_i

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads, losses = jax.lax.scan(body, zeros, (keys, xs))
            losses = list(losses)
        grads = jax.tree_util.tree_map(lambda g: g / MICRO, grads)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = ema_update(ema_params, new_params, 0.999)
        return new_params, new_ema, new_opt, jnp.mean(jnp.stack(losses))

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    data = jax.device_put(jnp.asarray(np.random.rand(BATCH, *PATCH, 1), jnp.bfloat16))
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        params, ema_params, opt_state, loss = step(params, ema_params, opt_state, sub, data)
    float(loss)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(2):
            rng, sub = jax.random.split(rng)
            params, ema_params, opt_state, loss = step(params, ema_params, opt_state, sub, data)
        float(loss)
    print("trace captured", flush=True)

    # aggregate device-time per op name from the trace
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events: dur in us; leaf ops carry hlo_category
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("name") == "process_name"}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower() and "xla" not in pname.lower():
            continue
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        cat = args.get("hlo_category", "")
        if not cat:
            continue  # keep only leaf ops (category-tagged); skip groupings
        per_op[(name, cat)] += e["dur"]
        per_cat[cat] += e["dur"]
        total += e["dur"]
    print(json.dumps({"total_leaf_us": total}), flush=True)
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"category": cat, "ms": round(us / 1e3, 2),
                          "pct": round(100 * us / max(total, 1), 1)}), flush=True)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:40]
    for (name, cat), us in top:
        print(json.dumps({"op": name[:120], "cat": cat, "ms": round(us / 1e3, 2),
                          "pct": round(100 * us / max(total, 1), 1)}), flush=True)


if __name__ == "__main__":
    main()
