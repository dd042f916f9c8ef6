"""Child process for the multi-host checkpoint TOPOLOGY-CHANGE test.

Run as:
  python tests/multihost_topology_child.py <coordinator> <nproc> <pid> \
      <outfile> <ckpt_dir> <phase>

``phase``:
  full    — run 4 global-view train steps straight through (control).
  save    — run steps 1-2, then save the full TrainState through the
            framework's CheckpointManager (the product surface).
  resume  — restore from <ckpt_dir> through CheckpointManager, run
            steps 3-4.

Every phase runs over jax.distributed with however many processes the
parent chose, on the same 4 GLOBAL CPU devices — so a checkpoint saved
under 2 processes can be restored under 1 and vice versa.  This is the
Orbax sharding-metadata trap every pod deployment hits on its first
resize (VERDICT r4 next-7): the framework's CheckpointManager
host-materializes state before saving (checkpoints.py ``_to_savable``),
which is exactly what makes the artifact topology-portable — this child
proves that contract end to end across REAL process boundaries.

The model/optimizer/batches mirror multihost_child.awr_train_section:
resnet_18 S=16, SGD (linear in the gradients, so cross-topology
comparisons stay tight), deterministic RandomState(7) batches, each
process shipping only its local row shard.
"""

import json
import sys

import jax

# this image's sitecustomize force-selects the tunneled TPU platform;
# switch to CPU before any backend initializes (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

STEPS_TOTAL = 4
STEPS_FIRST = 2  # steps run by the "save" phase
S, B = 16, 8


def make_batches(nproc: int, pid: int):
    """The deterministic global batch stream; returns per-step LOCAL
    shards plus the step index they belong to."""
    import numpy as np

    g = np.random.RandomState(7)
    per = B // nproc
    lo = pid * per
    out = []
    for _ in range(STEPS_TOTAL):
        img = np.ones((B, S, S), np.float32)
        img[:, 2:12, 2:12] = g.uniform(-1, 0.8,
                                       (B, 10, 10)).astype(np.float32)
        jt = g.uniform(-0.8, 0.8, (B, 14, 3)).astype(np.float32)
        out.append({"img": img[lo:lo + per], "jt_uvd": jt[lo:lo + per]})
    return out


def main():
    coord, nproc, pid, outfile, ckpt_dir, phase = sys.argv[1:7]
    nproc, pid = int(nproc), int(pid)

    jax.distributed.initialize(coord, nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from awr_tpu.config import Config
    from awr_tpu.models import get_deconv_net
    from awr_tpu.parallel.multihost import (global_mesh,
                                            host_local_batch_to_global)
    from awr_tpu.training.checkpoints import CheckpointManager
    from awr_tpu.training.optim import make_optimizer
    from awr_tpu.training.steps import TrainState, make_train_step

    mesh = global_mesh()
    cfg = Config(net="resnet_18", img_size=S, downsample=2,
                 kernel_size=1.0, dense_weight=1.0, coord_weight=1.0,
                 use_pallas=False)
    model = get_deconv_net(18, cfg.jt_num, cfg.downsample)
    optimizer = make_optimizer("sgd", 0.0)(learning_rate=1e-2)
    train_step = jax.jit(make_train_step(model, optimizer, cfg))

    rep = NamedSharding(mesh, P())

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 1)), train=True)
    variables = jax.device_put(variables, rep)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))

    if phase in ("full", "save"):
        first, last = 0, (STEPS_FIRST if phase == "save" else STEPS_TOTAL)
    else:
        assert phase == "resume", phase
        # restore with a structure TEMPLATE (the Trainer's own recipe,
        # trainer.py:455-480): Orbax returns plain dicts otherwise,
        # which optax's opt_state namedtuples reject
        template = dict(params=state.params,
                        batch_stats=state.batch_stats,
                        opt_state=state.opt_state, step=state.step)
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(template=template)
        mgr.close()
        # restored trees are host numpy — re-place on THIS topology
        state = TrainState(
            params=jax.device_put(restored["params"], rep),
            batch_stats=jax.device_put(restored["batch_stats"], rep),
            opt_state=jax.device_put(restored["opt_state"], rep),
            step=jnp.asarray(restored["step"], jnp.int32))
        first, last = STEPS_FIRST, STEPS_TOTAL

    losses = []
    for i, local in enumerate(make_batches(nproc, pid)):
        if not first <= i < last:
            continue  # keep the RandomState draw order identical
        gb = host_local_batch_to_global(local, mesh)
        assert gb["img"].shape == (B, S, S)
        state, metrics = train_step(state, gb)
        losses.append(float(metrics["loss"]))

    if phase == "save":
        mgr = CheckpointManager(ckpt_dir)
        mgr.save(0, dict(params=state.params,
                         batch_stats=state.batch_stats,
                         opt_state=state.opt_state,
                         step=state.step), block=True)
        mgr.close()

    def fingerprint(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): [float(jnp.sum(v)),
                                          float(jnp.sum(jnp.abs(v))),
                                          float(jnp.max(v))]
                for p, v in flat}

    out = dict(process=pid, nproc=nproc, phase=phase,
               ndev_global=jax.device_count(),
               step=int(jax.device_get(state.step)),
               losses=losses,
               params=fingerprint(state.params),
               stats=fingerprint(state.batch_stats))
    with open(outfile, "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
