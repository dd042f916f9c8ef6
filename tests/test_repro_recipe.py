"""The REPRO.md data-arrival recipe, run end-to-end on generated files.

Pre-verifies the one-command parity path (VERDICT r2 next-7) so real
NYU data arriving needs zero further engineering: the evaluate CLI on
an NYU-format tree produces a byte-format-identical ``test_%.3f.txt``
dump, and ``compare_dumps`` turns (golden, ours) into a frame-by-frame
mm diff with a scriptable tolerance gate.
"""

import glob
import json
import os
import re

import numpy as np
import pytest

from tests.test_nyu_files import write_fake_nyu

REF_DUMP = "/root/reference/results/resnet_18.txt"


@pytest.fixture(scope="module")
def recipe_run(tmp_path_factory):
    """REPRO.md step 1 (random-init weights, small shapes for CPU):
    evaluate CLI over an NYU-format tree -> prediction dump."""
    root = write_fake_nyu(str(tmp_path_factory.mktemp("nyu_repro")),
                          n_frames=4)
    out = str(tmp_path_factory.mktemp("out_parity"))

    from awr_tpu.training.evaluate import main

    main(["--net", "resnet_18", "--data-dir", root,
          "--epoch", "-1", "--output-dir", out,
          "--img-size", "64", "--compute-dtype", "float32"])
    dumps = glob.glob(os.path.join(out, "nyu", "checkpoint_nyu_resnet18",
                                   "test_*.txt"))
    assert len(dumps) == 1, dumps
    return root, dumps[0]


def test_dump_byte_format(recipe_run):
    """N rows x J*3 '%.3f' floats, space-separated — the exact format
    reference test.py:105-108 writes and results/*.txt ship."""
    _, dump = recipe_run
    lines = open(dump).read().splitlines()
    assert len(lines) == 4  # one row per test frame
    for ln in lines:
        toks = ln.split(" ")
        assert len(toks) == 14 * 3
        for t in toks:
            assert re.fullmatch(r"-?\d+\.\d{3}", t), t
    if os.path.exists(REF_DUMP):
        with open(REF_DUMP) as fh:
            ref_line = fh.readline().strip()
        assert len(ref_line.split(" ")) == 14 * 3


def test_compare_dumps_identity_and_gate(recipe_run, tmp_path, capsys):
    """REPRO.md step 2: golden-vs-golden diffs to zero and passes the
    0.1 mm gate; a perturbed dump fails it with exit 1."""
    from awr_tpu.evaluation import load_prediction_txt
    from awr_tpu.training.compare_dumps import main

    _, dump = recipe_run
    report = str(tmp_path / "diff.json")
    rc = main([dump, dump, "--tol-mm", "0.1", "--report", report])
    assert rc == 0
    stats = json.load(open(report))
    assert stats["mean_mm"] == 0.0 and stats["max_mm"] == 0.0
    assert stats["frames"] == 4 and stats["joints"] == 14
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["mean_mm"] == 0.0

    # perturb one joint of one frame by ~5 mm in depth
    arr = load_prediction_txt(dump)
    arr[2, 5, 2] += 5.0
    bad = str(tmp_path / "perturbed.txt")
    np.savetxt(bad, arr.reshape(arr.shape[0], -1), fmt="%.3f")
    rc = main([dump, bad, "--tol-mm", "0.01"])
    assert rc == 1
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # mean over 4*14 joints of a single 5 mm hit ~ 0.09 mm
    assert 0.05 < line["mean_mm"] < 0.15
    assert line["worst_frames"][0]["frame"] == 2


def test_compare_dumps_shape_mismatch(recipe_run, tmp_path):
    from awr_tpu.evaluation import load_prediction_txt
    from awr_tpu.training.compare_dumps import compare

    _, dump = recipe_run
    arr = load_prediction_txt(dump)
    with pytest.raises(ValueError, match="shape mismatch"):
        compare(arr, arr[:2], (588.03, 587.07, 320.0, 240.0), -1)


@pytest.mark.skipif(not os.path.exists(REF_DUMP),
                    reason="reference mount not present")
def test_compare_dumps_on_reference_goldens(tmp_path):
    """REPRO.md step 4: the two shipped golden dumps diff against each
    other — real 8,252-frame files through the full tool, reporting the
    (large, model-vs-model) gap between the two reference models."""
    from awr_tpu.training.compare_dumps import main

    hour = "/root/reference/results/hourglass_1.txt"
    report = str(tmp_path / "ref_diff.json")
    rc = main([REF_DUMP, hour, "--report", report])
    assert rc == 0  # no tolerance requested: informational run
    stats = json.load(open(report))
    assert stats["frames"] == 8252
    # two different trained models: clearly nonzero, single-digit mm
    assert 1.0 < stats["mean_mm"] < 20.0
