"""Decode dispatch: fused Pallas kernel on TPU, jnp elsewhere.

The jnp spelling (:func:`awr_tpu.ops.offset2joint_softmax`) is the
semantic definition and the differentiable path: the Pallas kernel runs
the forward; under ``grad`` the backward recomputes through the jnp
formula (cheap — the decode is a reduction, not a conv stack).

Multi-device: ``pallas_call`` has no GSPMD partitioning rule, so on a
sharded batch XLA would all-gather the full (B, F, F, 4J) map per step.
Pass ``mesh`` to wrap the kernel in ``shard_map`` over the batch axis —
each device then runs the kernel on its local shard only (the op is
per-sample, so this is exact).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P

from awr_tpu.ops.functional import offset2joint_softmax, on_tpu


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _decode_pallas_vjp(offset, img, kernel_size, interpret=False):
    from awr_tpu.ops.pallas_decode import decode_pallas

    return decode_pallas(offset, img, kernel_size, interpret=interpret)


def _fwd(offset, img, kernel_size, interpret):
    return (_decode_pallas_vjp(offset, img, kernel_size, interpret),
            (offset, img))


def _bwd(kernel_size, interpret, res, g):
    offset, img = res
    _, vjp = jax.vjp(
        lambda o, i: offset2joint_softmax(o, i, kernel_size), offset, img
    )
    return vjp(g)


_decode_pallas_vjp.defvjp(_fwd, _bwd)


def decode_offsets(offset, img, kernel_size, use_pallas: bool = False,
                   mesh=None, interpret: bool = False):
    """(B, F, F, 4J) dense map + (B, H, W) depth -> (B, J, 3) joints.

    Args:
      mesh: optional ``jax.sharding.Mesh``; when it has >1 devices the
        Pallas kernel is shard_map'ed over the batch axis (inputs must
        be batch-sharded with B divisible by the mesh size — the
        Trainer pads batches to guarantee this).
      interpret: force the Pallas path in interpreter mode (CPU
        testing).
    """
    if use_pallas and (on_tpu() or interpret):
        if mesh is not None and mesh.devices.size > 1:
            axis = mesh.axis_names[0]
            fn = jax.shard_map(
                lambda o, i: _decode_pallas_vjp(o, i, kernel_size,
                                                interpret),
                mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=P(axis),
                # pallas_call's out_shape carries no varying-mesh-axes
                # annotation; the kernel is per-sample, so this is safe
                check_vma=False)
            return fn(offset, img)
        return _decode_pallas_vjp(offset, img, kernel_size, interpret)
    return offset2joint_softmax(offset, img, kernel_size)
