"""Child process for the real multi-process multihost test.

Run as:
  python tests/multihost_child.py <coordinator> <nproc> <pid> <outfile>

Each process initializes jax.distributed over the CPU backend (2 local
devices per process via XLA_FLAGS), ships its LOCAL shard of a known
global batch through ``host_local_batch_to_global``, and runs one
global-view SGD step on a tiny linear model.  The parent test asserts
both processes produced identical, single-process-matching results —
exercising the real process-boundary code path of
awr_tpu/parallel/multihost.py.
"""

import json
import sys

import jax

# this image's sitecustomize force-selects the tunneled TPU platform;
# switch to CPU before any backend initializes (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")


def main():
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])
    outfile = sys.argv[4]

    jax.distributed.initialize(coord, nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from awr_tpu.parallel.multihost import (
        global_mesh,
        host_local_batch_to_global,
        initialize_distributed,
    )

    initialize_distributed()  # must be a no-op once initialized
    assert jax.process_count() == nproc, jax.process_count()

    mesh = global_mesh()

    # the same deterministic GLOBAL batch is known to every process;
    # each ships only its contiguous row shard
    g = np.random.RandomState(0)
    X = g.normal(size=(8, 4)).astype(np.float32)
    y = g.normal(size=(8, 1)).astype(np.float32)
    W = g.normal(size=(4, 1)).astype(np.float32)

    per = 8 // nproc
    lo = pid * per
    local = {"x": X[lo:lo + per], "y": y[lo:lo + per]}
    gb = host_local_batch_to_global(local, mesh)
    assert gb["x"].shape == (8, 4), gb["x"].shape

    W_dev = jax.device_put(jnp.asarray(W), NamedSharding(mesh, P()))

    @jax.jit
    def step(w, x, yy):
        def loss_fn(wp):
            return jnp.mean((x @ wp - yy) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.1 * grads

    loss, W_new = step(W_dev, gb["x"], gb["y"])
    x_sum = jax.jit(jnp.sum)(gb["x"])  # global reduction over all shards

    out = dict(
        process=pid,
        nproc=nproc,
        ndev_global=jax.device_count(),
        ndev_local=jax.local_device_count(),
        loss=float(loss),
        x_sum=float(x_sum),
        w_new=np.asarray(jax.device_get(W_new)).tolist(),
    )
    with open(outfile, "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
