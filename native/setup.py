"""Build the awr_tpu._native C++ extension in place.

Usage (from the repo root):
    python native/setup.py build_ext --inplace

Drops ``awr_tpu/_native.cpython-*.so`` into the package directory; the
Python wrappers (awr_tpu/data/native_decode.py) fall back to cv2 when
the extension has not been built.
"""

import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="awr-tpu-native",
    version="0.1",
    ext_modules=[
        Extension(
            "awr_tpu._native",
            sources=[os.path.join(HERE, "awr_host.cpp")],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
