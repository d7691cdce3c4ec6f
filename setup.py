"""Build the native host core into the wheel.

The C++ core (tiktoken_tpu/native/core.cpp) is loaded via ctypes, so it
is compiled as a plain shared library named like an extension module and
shipped inside the package — a pip install gets the fast host engine
with no compiler on the target machine (mirroring the reference's
prebuilt-native wheels, reference: setup.py:6-15,
.github/workflows/build_wheels.yml:19-43).

If no toolchain is available at build time the wheel still builds: the
runtime falls back to lazy g++ compilation (or the pure-Python engine),
exactly as before.
"""

from __future__ import annotations

import platform

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Best-effort native build: a missing/broken toolchain degrades to a
    pure-Python wheel instead of failing the install."""

    def run(self):  # noqa: D102
        try:
            super().run()
        except Exception as e:  # pragma: no cover - toolchain-dependent
            self.warn(f"native core build skipped ({e}); runtime will "
                      f"compile lazily or use the pure-Python engine")

    def build_extension(self, ext):  # noqa: D102
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            self.warn(f"native core build skipped ({e})")


setup(
    ext_modules=[
        Extension(
            "tiktoken_tpu.native._ttpu_core",
            sources=["tiktoken_tpu/native/core.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fPIC", "-pthread"]
            + (["-msse4.2"] if platform.machine() in ("x86_64", "AMD64")
               else []),
            extra_link_args=["-pthread"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
