"""Measure this session's host<->device tunnel bandwidth (CLAUDE.md: it
varies 25 MB/s - 0.5 GB/s between sessions; measure before trusting any
e2e number). 256 MB H2D device_put + D2H np.asarray round trips."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(jax.devices())
    x = np.random.RandomState(0).rand(64, 1024, 1024).astype(np.float32)  # 256 MB
    nbytes = x.nbytes
    # warm up small
    jnp.asarray(np.zeros(8, np.float32)).block_until_ready()
    t0 = time.perf_counter()
    d = jax.device_put(x)
    float(d.ravel()[0])  # force completion via readback of one element
    h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = np.asarray(d)
    d2h = time.perf_counter() - t0
    assert back[0, 0, 0] == x[0, 0, 0]
    out = {"h2d_MBps": round(nbytes / h2d / 1e6, 1),
           "d2h_MBps": round(nbytes / d2h / 1e6, 1)}
    print(json.dumps(out), flush=True)
    with open("probes/bandwidth_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
