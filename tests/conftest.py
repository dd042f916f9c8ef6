"""Test harness: run everything on a virtual 8-device CPU mesh.

This image's sitecustomize imports jax at interpreter startup and latches
the tunneled-TPU 'axon' platform from JAX_PLATFORMS, so plain env-var
edits here are too late for the platform choice — but jax.config still
wins if no backend has been initialized yet, and XLA_FLAGS is read when
the CPU client is created (standard JAX fake-mesh trick, SURVEY.md
section 4).  Unit tests must never grab the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()

# Build the native C++ extension on demand so tests/test_native.py RUNS
# (not skips) in a fresh checkout without a pip install step.  Takes a
# few seconds with g++; any failure leaves the cv2 fallback in place and
# the native tests skip as before.  AWR_SKIP_NATIVE_BUILD=1 disables.
import importlib.util  # noqa: E402
import pathlib  # noqa: E402
import subprocess  # noqa: E402
import sys  # noqa: E402

if not os.environ.get("AWR_SKIP_NATIVE_BUILD"):
    try:
        _have_native = importlib.util.find_spec("awr_tpu._native")
    except (ImportError, ModuleNotFoundError):
        _have_native = None
    if _have_native is None:
        _root = pathlib.Path(__file__).resolve().parent.parent
        try:
            subprocess.run(
                [sys.executable, str(_root / "native" / "setup.py"),
                 "build_ext", "--inplace"],
                cwd=str(_root), check=True, capture_output=True,
                timeout=600)
        except Exception:
            pass
