"""Depth data pipeline.

Host side (numpy/cv2, reference-exact): PNG decode, crop geometry,
normalization, choose-one augmentation — :mod:`awr_tpu.data.transforms`,
:mod:`awr_tpu.data.nyu`.

Device side (jitted, static shapes): the same crop/normalize expressed as
one fused gather from the raw depth frame — :mod:`awr_tpu.data.device`.

Synthetic data for tests/benchmarks where the real NYU files are absent:
:mod:`awr_tpu.data.synthetic`.
"""

from awr_tpu.data.hands17 import Hands17Dataset  # noqa: F401
from awr_tpu.data.icvl import ICVLDataset  # noqa: F401
from awr_tpu.data.msra import MSRADataset  # noqa: F401
from awr_tpu.data.nyu import NYUDataset  # noqa: F401
from awr_tpu.data.synthetic import SyntheticHandDataset  # noqa: F401
