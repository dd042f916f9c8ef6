"""AWR dense-representation ops, fused kernels, and losses."""

from awr_tpu.ops.functional import (  # noqa: F401
    joint2offset,
    offset2joint_softmax,
    pixel_mesh,
    resize_nearest,
)
from awr_tpu.ops.loss import smooth_l1_loss  # noqa: F401
