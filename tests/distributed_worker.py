"""Worker for the 2-process `jax.distributed` CPU smoke test.

Run by tests/test_distributed.py as: python distributed_worker.py <proc_id>
<n_proc> <port>. Exercises the real multi-host path the reference gets from
Lightning DDP (reference train.py:71): DCN-style rendezvous via
`jax.distributed.initialize`, a global mesh spanning both processes, a
replicated psum, and one data-parallel gradient step whose all-reduce
crosses the process boundary.
"""
import os
import sys

proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env vars

from keypointnerf_tpu.parallel import initialize_distributed

initialize_distributed(f"localhost:{port}", n_proc, proc_id)
assert jax.process_count() == n_proc, jax.process_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2 * n_proc, devs  # 2 virtual CPU devices per process
mesh = Mesh(np.asarray(devs), axis_names=("data",))
data_shard = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

# 1) cross-process sum: each process contributes its process_index
local = np.full((2, 1), float(jax.process_index()), np.float32)
garr = jax.make_array_from_process_local_data(data_shard, local, (2 * n_proc, 1))
total = jax.jit(jnp.sum, out_shardings=repl)(garr)
got = float(np.asarray(total.addressable_data(0)))
expect = float(sum(2 * i for i in range(n_proc)))
assert got == expect, (got, expect)

# 2) one DP gradient step of a tiny least-squares model: the gradient
# all-reduce must cross the process boundary and agree on both processes
w0 = jnp.zeros((1,), jnp.float32)
w = jax.device_put(w0, repl)
x_local = np.asarray([[1.0 + jax.process_index()], [2.0 + jax.process_index()]],
                     np.float32)
y_local = 3.0 * x_local
x = jax.make_array_from_process_local_data(data_shard, x_local, (2 * n_proc, 1))
y = jax.make_array_from_process_local_data(data_shard, y_local, (2 * n_proc, 1))


@jax.jit
def grad_step(w, x, y):
    loss = lambda w: jnp.mean((x[:, 0] * w[0] - y[:, 0]) ** 2)
    return w - 0.1 * jax.grad(loss)(w)


w1 = jax.jit(grad_step, out_shardings=repl)(w, x, y)
w1_host = float(np.asarray(w1.addressable_data(0)))
# closed form: w1 = 0.1 * 2 * mean(x^2) * 3 with w0=0
xs = np.concatenate([[1.0 + i, 2.0 + i] for i in range(n_proc)])
expect_w1 = 0.6 * float(np.mean(xs**2))
assert abs(w1_host - expect_w1) < 1e-5, (w1_host, expect_w1)

print(f"WORKER_OK {proc_id} {got} {w1_host:.6f}", flush=True)
