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
