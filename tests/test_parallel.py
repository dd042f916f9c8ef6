"""Mesh/sharding helper tests + multi-host single-process path +
profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from awr_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from awr_tpu.parallel.multihost import (
    global_mesh,
    host_local_batch_to_global,
    initialize_distributed,
)


def test_make_mesh_sizes():
    assert make_mesh(1).devices.size == 1
    assert make_mesh().devices.size == jax.device_count()


def test_shard_batch_places_on_batch_axis():
    mesh = make_mesh(8)
    batch = {"img": np.zeros((16, 8, 8), np.float32),
             "jt": np.zeros((16, 14, 3), np.float32)}
    dev = shard_batch(batch, mesh)
    assert dev["img"].sharding.is_equivalent_to(data_sharding(mesh), 3)
    # each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in dev["img"].addressable_shards}
    assert shard_shapes == {(2, 8, 8)}


def test_replicated_state():
    mesh = make_mesh(8)
    x = jax.device_put(jnp.ones((4, 4)), replicated(mesh))
    assert len(x.addressable_shards) == 8
    assert all(s.data.shape == (4, 4) for s in x.addressable_shards)


def test_multihost_single_process_path():
    initialize_distributed(num_processes=1)  # no-op
    mesh = global_mesh()
    batch = {"img": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    g = host_local_batch_to_global(batch, mesh)
    assert g["img"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(g["img"]), batch["img"])


def test_step_timer_and_flops():
    from awr_tpu.utils.profiling import StepTimer, flops_of

    t = StepTimer()
    t.start()
    x = jnp.ones((128, 128))
    for _ in range(3):
        t.tick(x * 2)
    s = t.summary()
    assert s["mean_s"] >= 0 and s["steps_per_s"] > 0

    f = flops_of(lambda a, b: a @ b, jnp.ones((64, 64)),
                 jnp.ones((64, 64)))
    if f is not None:  # CPU backend exposes a cost model in current jax
        assert f >= 2 * 64**3 * 0.5


def test_model_summary_runs(capsys):
    from awr_tpu.models.summary import summarize

    n, flops = summarize("resnet_18", 64)
    # 11M-class encoder + 256-ch deconv decoder heads
    assert 10e6 < n < 30e6
    out = capsys.readouterr().out
    assert "params" in out
