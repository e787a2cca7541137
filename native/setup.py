"""Build the anystereo_native C++ extension:

    python native/setup.py build_ext --inplace

(or let anystereo_tpu.data.native_io auto-build on first use).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="anystereo_native",
    ext_modules=[
        Extension(
            "anystereo_native",
            sources=["anystereo_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        )
    ],
)
