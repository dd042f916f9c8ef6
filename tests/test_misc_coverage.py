"""Small coverage tests: deep-resnet weight import structure, restore
error paths, profiler trace artifacts."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


@pytest.mark.skipif(not HAS_REF, reason="reference mount not present")
def test_resnet101_import_structure():
    """Bottleneck-depth importer covers every 101-layer torch tensor and
    the resulting tree type-checks against the flax module (eval_shape —
    too big to execute on the test CPU)."""
    sys.path.insert(0, REF)
    from model.resnet_deconv import get_deconv_net as ref_factory

    import jax
    import jax.numpy as jnp
    from awr_tpu.models import get_deconv_net
    from awr_tpu.models.torch_import import import_reference_weights

    ref = ref_factory(101, 14, 2)
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = import_reference_weights("resnet_101", sd)
    n_imported = len(jax.tree_util.tree_leaves(variables))
    assert n_imported == len(sd), (n_imported, len(sd))
    model = get_deconv_net(101, 14, 2)
    out = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((1, 64, 64, 1)), train=False),
        variables)
    assert out.shape == (1, 32, 32, 56)


def test_restore_without_checkpoint_raises(tmp_path):
    from awr_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore()
    mgr.close()


def test_profiler_trace_writes_artifacts(tmp_path):
    import jax.numpy as jnp

    from awr_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    files = []
    for root, _, fs in os.walk(d):
        files.extend(fs)
    assert files, "no profiler artifacts written"


def test_config_replace_and_factories():
    from awr_tpu.config import Config, hourglass_config, resnet_config

    cfg = resnet_config(50, batch_size=8)
    assert cfg.net == "resnet_50" and cfg.kernel_size == 1.0
    cfg2 = cfg.replace(downsample=4)
    assert cfg2.feature_size == 32 and cfg.feature_size == 64
    hg = hourglass_config(2)
    assert hg.nstack == 2 and hg.kernel_size == 0.4
    assert Config().paras[0] == 588.03


def test_cli_pallas_flag_tristate():
    """Unset --pallas/--no-pallas must follow Config.use_pallas (the
    measured-winner default), not silently force the kernel on."""
    import argparse

    from awr_tpu.config import Config
    from awr_tpu.training.evaluate import add_common_args, build_config

    ap = argparse.ArgumentParser()
    add_common_args(ap)
    assert build_config(ap.parse_args([])).use_pallas \
        == Config().use_pallas
    assert build_config(ap.parse_args(["--pallas"])).use_pallas is True
    assert build_config(
        ap.parse_args(["--no-pallas"])).use_pallas is False


def test_synthetic_grid_layout_all_visible():
    """layout='grid' places equal small spheres on a jittered grid so
    EVERY joint is observable from the camera (no occlusion floor) —
    the convergence-run task (benchmarks/convergence_run.py).  Covers
    14 joints (NYU, side-4 grid) AND 21 (MSRA/HANDS17, side-5 — the
    spacing/jitter/radius shrink together to keep spheres disjoint)."""
    import numpy as np

    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.geometry import xyz2uvd_np

    for jt_num in (14, 21):
        ds = SyntheticHandDataset(3, jt_num, 64, phase="test", seed=0,
                                  layout="grid")
        r = ds._radii[0]
        for i in range(3):
            img, jt_xyz, center = ds.raw_item(i)
            # disjoint spheres: pairwise center distance > 2r
            d2 = np.linalg.norm(
                jt_xyz[:, None] - jt_xyz[None, :], axis=-1)
            np.fill_diagonal(d2, np.inf)
            assert d2.min() > 2 * r, (jt_num, d2.min(), r)
            # each joint's projected pixel must see a surface within
            # its sphere radius + rendering slack -> joint visible
            uvd = xyz2uvd_np(jt_xyz, ds.paras, ds.flip)
            for (u, v, d) in uvd:
                z = img[int(round(v)), int(round(u))]
                assert 0 < z <= d + 1.0 and z >= d - (r + 2.0), (z, d)
