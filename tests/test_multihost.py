"""Multi-HOST (multi-process) data parallelism: two coordinated processes, each
owning 2 virtual CPU devices, assemble a global batch with
jax.make_array_from_process_local_data and run one jitted global computation —
the exact primitives Trainer/PretrainTrainer use when jax.process_count() > 1
(reference analog: mp.spawn + init_process_group + per-rank batch split,
run_training.py:108-142)."""
import os
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
nproc = int(sys.argv[4])
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from anatomask_tpu.parallel.mesh import compute_shard_batch_and_oversample

assert jax.process_count() == nproc
devices = jax.devices()          # global: 2 local devices per process
n_dev = 2 * nproc
assert len(devices) == n_dev
mesh = Mesh(np.array(devices), ("data",))
bsh = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

# per-host sampler spec: global batch = n_dev, oversample 0.5 -> each host 2
# samples, the forced-foreground tail lands on the later hosts
local_bs, local_os = compute_shard_batch_and_oversample(n_dev, 0.5, proc_id, nproc)
assert local_bs == 2
if proc_id < nproc // 2:
    assert local_os == 0.0, (proc_id, local_os)
elif proc_id >= (nproc + 1) // 2:
    assert local_os == 1.0, (proc_id, local_os)

# this host's local slice of the global batch (deterministic content)
local = np.arange(n_dev * 8 * 128, dtype=np.float32).reshape(n_dev, 8, 128)
local = local[proc_id * 2:(proc_id + 1) * 2]
garr = jax.make_array_from_process_local_data(bsh, local)

@jax.jit
def global_loss(x):
    return jnp.mean(x * x)   # touches every shard; GSPMD inserts the psum

expected = float(np.mean(np.square(np.arange(n_dev * 8 * 128, dtype=np.float32))))
got = float(global_loss(garr))
assert abs(got - expected) / expected < 1e-6, (got, expected)
with open(os.path.join(outdir, f"rank{proc_id}.ok"), "w") as f:
    f.write(f"{got:.6f}")
"""


def _run_workers(tmp_path, nproc):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = str(29000 + (os.getpid() + nproc) % 1000)
    env = dict(os.environ)
    # workers run a script from tmp_path: the repo root is NOT implicitly on
    # their sys.path, so pass it explicitly
    import anatomask_tpu
    repo_root = os.path.dirname(os.path.dirname(anatomask_tpu.__file__))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, str(tmp_path), str(nproc)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{outs[i]}"
    vals = [open(tmp_path / f"rank{i}.ok").read() for i in range(nproc)]
    assert len(set(vals)) == 1  # every host computed the identical global loss


def test_two_process_data_parallel(tmp_path):
    _run_workers(tmp_path, 2)


def test_four_process_eight_way_data_parallel(tmp_path):
    """8-way multiprocess (4 coordinated processes x 2 devices), the VERDICT
    round-2 acceptance shape for multi-host."""
    _run_workers(tmp_path, 4)
