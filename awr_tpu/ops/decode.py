"""Decode dispatch: fused Pallas kernel on TPU, jnp elsewhere.

The jnp spelling (:func:`awr_tpu.ops.offset2joint_softmax`) is the
semantic definition and the differentiable path: the Pallas kernel runs
the forward; under ``grad`` the backward recomputes through the jnp
formula (cheap — the decode is a reduction, not a conv stack).
"""

from __future__ import annotations

import functools

import jax

from awr_tpu.ops.functional import offset2joint_softmax, on_tpu


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _decode_pallas_vjp(offset, img, kernel_size):
    from awr_tpu.ops.pallas_decode import decode_pallas

    return decode_pallas(offset, img, kernel_size)


def _fwd(offset, img, kernel_size):
    return _decode_pallas_vjp(offset, img, kernel_size), (offset, img)


def _bwd(kernel_size, res, g):
    offset, img = res
    _, vjp = jax.vjp(
        lambda o, i: offset2joint_softmax(o, i, kernel_size), offset, img
    )
    return vjp(g)


_decode_pallas_vjp.defvjp(_fwd, _bwd)


def decode_offsets(offset, img, kernel_size, use_pallas: bool = True):
    """(B, F, F, 4J) dense map + (B, H, W) depth -> (B, J, 3) joints."""
    if use_pallas and on_tpu():
        return _decode_pallas_vjp(offset, img, kernel_size)
    return offset2joint_softmax(offset, img, kernel_size)
