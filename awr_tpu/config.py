"""Experiment configuration.

Reference parity: mirrors every key of the reference's class-attribute
singleton (reference config.py:19-52) plus the per-dataset JOINT/STEP/EPOCH
tables (config.py:1-18), re-expressed as a frozen-free dataclass so configs
are explicit values rather than process-global state.  TPU-specific knobs
(mesh shape, dtypes, matmul precision, pallas toggle) are additive.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Per-dataset tables (reference config.py:1-18).
JOINT = {"nyu": 14, "icvl": 16, "msra": 21, "hands17": 21}
STEP = {"nyu": 30, "icvl": 10, "msra": 10, "hands17": 5}
EPOCH = {"nyu": 40, "icvl": 40, "msra": 25, "hands17": 10}

# Camera intrinsics (fx, fy, u0, v0) per dataset.
# NYU: reference nyu_loader.py:23; ICVL/MSRA: the datasets' published
# calibrations (reference configures these datasets but ships no loader).
NYU_PARAS = (588.03, 587.07, 320.0, 240.0)
DATASET_PARAS = {
    "nyu": NYU_PARAS,
    "icvl": (241.42, 241.42, 160.0, 120.0),
    "msra": (241.42, 241.42, 160.0, 120.0),
}
# y-axis flip in xyz<->uvd transforms (nyu_loader.py:34)
DATASET_FLIP = {"nyu": -1, "icvl": 1, "msra": 1, "hands17": 1}
# crop cube defaults (mm): NYU per reference config.py:30; others per the
# AWR-family conventions for those datasets
DATASET_CUBE = {
    "nyu": (300.0, 300.0, 300.0),
    "icvl": (250.0, 250.0, 250.0),
    "msra": (200.0, 200.0, 200.0),
    "hands17": (300.0, 300.0, 300.0),
}


@dataclasses.dataclass
class Config:
    """All knobs for data, model, optimization and evaluation.

    Defaults follow the reference's published NYU recipe
    (reference config.py:19-52).
    """

    # --- experiment bookkeeping (reference config.py:20-27) ---
    exp_id: str = "nyu_hourglass"
    log_id: str = "dense"
    data_dir: str = "./data"
    dataset: str = "nyu"
    output_dir: str = "./output/"
    load_model: str = ""  # checkpoint dir to resume/eval from ('' = fresh)

    # --- geometry / data (reference config.py:29-37) ---
    jt_num: int = JOINT["nyu"]
    cube: Tuple[float, float, float] = (300.0, 300.0, 300.0)
    # (sigma_trans mm, sigma_scale, sigma_rot deg) (reference config.py:31)
    augment_para: Tuple[float, float, float] = (10.0, 0.1, 180.0)
    img_size: int = 128
    batch_size: int = 32
    num_workers: int = 8  # host-side prefetch threads (reference: loader procs)

    # --- model (reference config.py:33-34) ---
    net: str = "hourglass_1"  # 'hourglass_<nstack>' | 'resnet_{18,50,101,152}'
    downsample: int = 2  # output stride in {1,2,4}

    # --- optimization (reference config.py:38-47) ---
    max_epoch: int = EPOCH["nyu"]
    loss_type: str = "MyL1Loss"
    dense_weight: float = 1.0
    coord_weight: float = 0.0
    kernel_size: float = 0.4  # 0.4 for hourglass, 1.0 for resnet (config.py:42)
    lr: float = 1e-3
    optimizer: str = "adam"  # 'adam' | 'sgd'
    scheduler: str = "step"  # 'step' | 'auto' (ReduceLROnPlateau)
    step: int = STEP["nyu"]
    weight_decay: float = 0.0
    print_freq: int = 100
    vis_freq: int = 1

    # --- TPU-native additions (no reference counterpart; SURVEY.md §5.8) ---
    # Data-parallel mesh axis size; None = all local devices.
    mesh_devices: Optional[int] = None
    # Parameter / compute dtypes. Parity runs use float32; production bf16.
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # jax matmul precision: 'default' | 'high' | 'highest'.
    matmul_precision: str = "highest"
    # Use the fused Pallas encode/decode kernels when on TPU.  Default
    # FALSE: after the decode was rewritten as fusable contractions
    # (ops/functional.py), the XLA spelling measures ~8-12% faster
    # end-to-end than the Pallas kernel (benchmarks/
    # sweep_r02_decode.jsonl rows dated v2) — the default follows the
    # winner; the kernels remain available and tested.
    use_pallas: bool = False
    # Supervise all hourglass stacks in one fused fwd/bwd (True, recommended)
    # or only the last stack (False: strict reference behavior — the reference
    # loop at train.py:116-121 overwrites `loss` per stage so only the last
    # stack's loss is backpropagated, recomputing the forward nstack times).
    supervise_all_stacks: bool = True
    # Stage (pad + H2D transfer + shard) up to N batches ahead of the
    # train/eval loop on a background thread (data/pipeline.py
    # prefetch_to_device), overlapping the device upload with host-side
    # decode.  0 = stage inline (reference-like serial behavior).
    device_prefetch: int = 2
    # Split each train batch into N sequential microbatches inside the
    # jitted step (lax.scan), averaging gradients before ONE optimizer
    # update: the effective batch stays `batch_size` while peak
    # activation memory drops ~N-fold.  BatchNorm statistics are
    # computed per microbatch (standard grad-accum semantics, same as
    # torch with N smaller batches).  batch_size must divide by it.
    grad_accum: int = 1
    # Rematerialize (jax.checkpoint) each backbone block / hourglass
    # stack in the backward pass: activations inside each unit are
    # recomputed instead of stored, trading ~1 extra forward of FLOPs
    # for a large cut in peak HBM.  Param trees are unchanged, so
    # checkpoints are compatible either way.
    remat: bool = False
    # Stall watchdog (training/watchdog.py): if no train/eval step
    # completes for this many seconds the process exits with the
    # distinctive EXIT_STALLED code so a supervisor
    # (training/supervise.py) can restart it — the Trainer auto-resumes
    # from the newest committed checkpoint.  Guards against the observed
    # wedged-device-dispatch failure mode, which blocks the main thread
    # in a native call forever.  None = disabled (reference behavior:
    # no failure detection).  Size it to cover the slowest legitimate
    # gap (a full eval pass + checkpoint save), not one step.  Note the
    # per-iteration beat fires after the async dispatch ENQUEUE, not
    # device completion, so a wedged device is only detected at the
    # next host sync (the print_freq loss materialization / end-of-
    # epoch drain): worst-case detection latency is step_timeout_s +
    # print_freq steps' dispatch time, not one step (trainer._beat).
    step_timeout_s: Optional[float] = None
    # RNG seed for params/augmentation.
    seed: int = 23455
    # Keep only the newest N epoch checkpoints (None = keep all, the
    # reference behavior; long runs should bound disk growth).
    ckpt_max_to_keep: Optional[int] = None

    @property
    def feature_size(self) -> int:
        """Side of the dense 4J-channel output map (reference train.py:110)."""
        return self.img_size // self.downsample

    @property
    def nstack(self) -> int:
        if self.net.startswith("hourglass"):
            return int(self.net.split("_")[-1])
        return 1

    @property
    def paras(self) -> Tuple[float, float, float, float]:
        try:
            return DATASET_PARAS[self.dataset]
        except KeyError:
            raise NotImplementedError(
                f"unknown dataset {self.dataset!r}") from None

    @property
    def flip(self) -> int:
        return DATASET_FLIP.get(self.dataset, 1)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def resnet_config(layers: int = 18, **kw) -> Config:
    """Reference resnet recipe: kernel_size 1.0 (reference config.py:42)."""
    kw.setdefault("kernel_size", 1.0)
    kw.setdefault("exp_id", f"nyu_resnet{layers}")
    return Config(net=f"resnet_{layers}", **kw)


def hourglass_config(nstack: int = 1, **kw) -> Config:
    kw.setdefault("kernel_size", 0.4)
    return Config(net=f"hourglass_{nstack}", **kw)
