"""Build shim: compiles the native C++ runtime (Keccak/STROBE transcript
engine + curve backend, native/qq_native.cpp + native/qq_curve.cpp) into a
shared object shipped inside the package. The library is loaded via ctypes
(quisquis_tpu/utils/_libpath.py) — it exposes a C ABI, not a CPython module
— so a plain Extension with no Python headers involved is all we need.

A failed native build is non-fatal at runtime: every function has a
pure-Python fallback (slower, bit-identical).
"""

from setuptools import setup, Extension
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            print(f"WARNING: native extension build failed ({exc}); "
                  "installing with pure-Python fallbacks")

    def get_export_symbols(self, ext):
        return []  # C ABI library, not a CPython init-symbol module


setup(
    ext_modules=[
        Extension(
            "quisquis_tpu.libqq_native",
            sources=["native/qq_native.cpp", "native/qq_curve.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
            language="c++",
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
