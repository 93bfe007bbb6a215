"""Locate the native C++ runtime library (qq_native + qq_curve).

Search order:
 1. ``QQ_NATIVE_LIB`` environment variable (explicit override),
 2. a shared object shipped inside the installed package (built by
    ``pip install .`` via setup.py's Extension),
 3. the repo-checkout path ``native/libqq_native.so`` (built by
    ``make -C native``).

Every native function has a pure-Python fallback, so a missing library
degrades performance, not functionality.
"""

from __future__ import annotations

import glob
import os
from typing import Optional


def find_native_lib() -> Optional[str]:
    env = os.environ.get("QQ_NATIVE_LIB")
    if env:
        return env if os.path.exists(env) else None
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in sorted(glob.glob(os.path.join(pkg_dir, "libqq_native*.so"))):
        return cand
    repo = os.path.join(os.path.dirname(pkg_dir), "native", "libqq_native.so")
    if os.path.exists(repo):
        return repo
    return None
