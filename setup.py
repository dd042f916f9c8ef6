"""Builds awr_tpu._native (the GIL-releasing C++ PNG/host-IO extension,
native/awr_host.cpp) as part of the normal package build, so
``pip install -e .`` produces a working ``awr_tpu._native`` and the
tests/test_native.py parity suite runs instead of skipping.

The extension is OPTIONAL: any compiler/zlib failure degrades to a
warning and a pure-Python install (awr_tpu/data/native_decode.py falls
back to cv2 at runtime).  Metadata lives in pyproject.toml.
"""

import sys

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """build_ext that downgrades compile failures to a warning."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # compiler missing entirely
            self._warn(exc)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # compile/link error (e.g. no zlib)
            self._warn(exc)

    @staticmethod
    def _warn(exc):
        print(
            f"WARNING: building awr_tpu._native failed ({exc!r}); "
            "installing without the native host-IO extension "
            "(cv2 fallback will be used)",
            file=sys.stderr,
        )


setup(
    ext_modules=[
        Extension(
            "awr_tpu._native",
            sources=["native/awr_host.cpp"],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
