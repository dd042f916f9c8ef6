"""Failure detection: stall watchdog + restart supervisor (SURVEY.md
§5.3 — the reference has none; its recovery story is per-epoch
checkpoints rerun by hand, reference train.py:162-172).

The failure mode being guarded (a device dispatch wedging the main
thread forever) can't be reproduced portably, so the stall is simulated
with a sleep; the exit path runs in a real subprocess because the
production watchdog terminates via ``os._exit``."""

import os
import subprocess
import sys
import threading
import time

from awr_tpu.config import Config
from awr_tpu.data.synthetic import SyntheticHandDataset
from awr_tpu.training.supervise import supervise
from awr_tpu.training.trainer import Trainer
from awr_tpu.training.watchdog import EXIT_STALLED, Watchdog


# ------------------------------------------------------------ watchdog
def test_watchdog_quiet_while_beating():
    fired = []
    with Watchdog(0.4, exit_fn=fired.append) as wd:
        for _ in range(8):
            time.sleep(0.1)
            wd.beat()
    assert not fired


def test_watchdog_fires_on_silence_and_reports():
    fired = threading.Event()
    msgs = []
    wd = Watchdog(0.3, on_stall=msgs.append, name="unit",
                  exit_fn=lambda code: (msgs.append(code), fired.set()))
    wd.start()
    try:
        assert fired.wait(3.0), "watchdog never fired"
    finally:
        wd.stop()
    assert EXIT_STALLED in msgs
    assert any("WATCHDOG[unit]" in m for m in msgs if isinstance(m, str))


def test_watchdog_rejects_bad_timeout():
    try:
        Watchdog(0)
    except ValueError:
        pass
    else:
        raise AssertionError("timeout_s=0 accepted")


def test_watchdog_exits_process_for_real():
    # the production path: os._exit(EXIT_STALLED) from the daemon thread
    # while the main thread is stuck in an uninterruptible call
    code = (
        "import time\n"
        "from awr_tpu.training.watchdog import Watchdog\n"
        "wd = Watchdog(0.3, name='e2e').start()\n"
        "wd.beat()\n"
        "time.sleep(30)\n"  # 'wedged dispatch'
        "print('unreachable')\n"
    )
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=60)
    assert p.returncode == EXIT_STALLED, (p.returncode, p.stderr)
    assert "WATCHDOG[e2e]" in p.stderr
    assert "unreachable" not in p.stdout


# ----------------------------------------------------------- supervisor
def test_supervise_restarts_on_stall_then_succeeds():
    codes = iter([EXIT_STALLED, EXIT_STALLED, 0])
    ran = []
    rc = supervise(["cmd"], max_restarts=3, backoff_s=0,
                   run_fn=lambda c: (ran.append(list(c)),
                                     next(codes))[1], log=lambda m: None)
    assert rc == 0
    assert len(ran) == 3


def test_supervise_does_not_retry_crashes_by_default():
    calls = []
    rc = supervise(["cmd"], max_restarts=3, backoff_s=0,
                   run_fn=lambda c: (calls.append(1), 1)[1],
                   log=lambda m: None)
    assert rc == 1 and len(calls) == 1
    # but restart_on='any' does retry them
    codes = iter([1, 0])
    rc = supervise(["cmd"], max_restarts=3, restart_on="any",
                   backoff_s=0, run_fn=lambda c: next(codes),
                   log=lambda m: None)
    assert rc == 0


def test_supervise_exhausts_restart_budget():
    rc = supervise(["cmd"], max_restarts=2, backoff_s=0,
                   run_fn=lambda c: EXIT_STALLED, log=lambda m: None)
    assert rc == EXIT_STALLED


def test_supervise_cli_roundtrip(tmp_path):
    # real subprocess through the CLI: first attempt stalls (marker file
    # absent), the restart succeeds
    marker = tmp_path / "ran_once"
    child = (
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    sys.exit(0)\n"
        "open(m, 'w').close()\n"
        "sys.exit(86)\n"
    )
    script = tmp_path / "child.py"
    script.write_text(child)
    p = subprocess.run(
        [sys.executable, "-m", "awr_tpu.training.supervise",
         "--max-restarts", "2", "--backoff", "0", "--",
         sys.executable, str(script)],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, (p.returncode, p.stdout, p.stderr)
    assert "restarting" in p.stdout


# ---------------------------------------------------- Trainer integration
def test_trainer_watchdog_armed_and_disarmed(tmp_path):
    # a healthy 1-epoch run under a generous timeout completes normally
    # and leaves the watchdog disarmed
    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=64,
                 batch_size=4, vis_freq=0, print_freq=1000,
                 max_epoch=1, step_timeout_s=300.0)
    train = SyntheticHandDataset(8, 14, 64, phase="test", seed=0)
    train.phase = "train"
    train.val = True
    test = SyntheticHandDataset(4, 14, 64, phase="test", seed=1)
    tr = Trainer(cfg, train, test, workdir=str(tmp_path))
    seen = {}
    orig_impl = Trainer._train_impl

    def spy(self):
        seen["armed"] = self._watchdog is not None
        return orig_impl(self)

    Trainer._train_impl = spy
    try:
        tr.train()
    finally:
        Trainer._train_impl = orig_impl
    assert seen["armed"], "watchdog not armed despite step_timeout_s"
    assert tr._watchdog is None, "watchdog left armed after train()"
    tr.close()


def test_trainer_stall_kills_process(tmp_path):
    # end-to-end: a Trainer whose step stream stops beating exits 86.
    # The stall is injected by replacing _train_impl with a beat-then-
    # hang loop (no jit compile needed; the watchdog logic under test
    # is identical).
    code = (
        "import time\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # not the chip
        "from awr_tpu.config import Config\n"
        "from awr_tpu.data.synthetic import SyntheticHandDataset\n"
        "from awr_tpu.training.trainer import Trainer\n"
        "def hang(self):\n"
        "    self._beat()\n"
        "    time.sleep(60)\n"  # wedged dispatch stand-in
        "Trainer._train_impl = hang\n"
        "cfg = Config(net='resnet_18', kernel_size=1.0, img_size=64,\n"
        "             batch_size=4, vis_freq=0, max_epoch=1,\n"
        "             step_timeout_s=1.0)\n"
        "train = SyntheticHandDataset(8, 14, 64, phase='test', seed=0)\n"
        "train.phase = 'train'\n"
        f"tr = Trainer(cfg, train, workdir={str(tmp_path)!r})\n"
        "tr.train()\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               PYTHONPATH=repo + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300,
                       cwd=str(tmp_path), env=env)
    assert p.returncode == EXIT_STALLED, (p.returncode, p.stderr[-2000:])
    # the stall diagnostic also lands in the run log via on_stall
    logs = list(tmp_path.glob("*.log"))
    assert logs and any("WATCHDOG" in f.read_text() for f in logs)
