"""AWR-TPU: TPU-native Adaptive Weighting Regression for 3D hand pose.

A from-scratch JAX/XLA/Pallas rebuild of the AAAI-2020 AWR method
(reference: Elody-07/AWR-Adaptive-Weighting-Regression): 3D hand-joint
estimation from single depth images, where joints are decoded as an
adaptive softmax-weighted integration over a dense per-pixel offset field.

Layout (mirrors SURVEY.md section 1's layer map, re-designed TPU-first):

- ``awr_tpu.config``     — dataclass config (reference: config.py)
- ``awr_tpu.geometry``   — pinhole camera xyz<->uvd (reference: util/util.py)
- ``awr_tpu.ops``        — AWR dense encode/decode + Pallas fusions + loss
                            (reference: util/feature_tool.py, model/loss.py)
- ``awr_tpu.models``     — ResNet-deconv + stacked Hourglass backbones in flax
                            (reference: model/resnet_deconv.py, model/hourglass.py)
- ``awr_tpu.data``       — NYU pipeline: host decode + fused device-side
                            crop/normalize/augment (reference: dataloader/)
- ``awr_tpu.parallel``   — device mesh + sharding helpers (new; reference is
                            single-GPU, SURVEY.md section 5.8)
- ``awr_tpu.evaluation`` — mm-space MPE/median/PCK/AUC (reference: util/eval_tool.py)
- ``awr_tpu.training``   — jitted train/eval drivers, Orbax checkpoints
                            (reference: train.py, test.py)
- ``awr_tpu.vis``        — skeleton overlay rendering (reference: util/vis_tool.py)
"""

__version__ = "0.1.0"

from awr_tpu.config import Config  # noqa: F401
