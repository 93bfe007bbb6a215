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
import shutil
import subprocess
import sys
import time
from typing import Optional


def _try_build(native_dir: str) -> None:
    """Best-effort `make -C native` in a repo checkout: a fresh clone has
    the sources but not the .so, and every host hot path (STROBE, curve,
    MSM) silently degrades to the pure-Python fallback without it.

    Set ``QQ_NO_NATIVE_BUILD=1`` to skip the auto-build entirely. The
    Makefile builds to a temp file and renames atomically, and a lock
    directory serializes concurrent importers, so a second process never
    dlopens a half-written .so.
    """
    if os.environ.get("QQ_NO_NATIVE_BUILD") == "1":
        return
    if shutil.which("make") is None:
        print("quisquis_tpu: native toolchain ('make') not found; "
              "using pure-Python fallbacks (slower)", file=sys.stderr)
        return
    lock = os.path.join(native_dir, ".build_lock")
    try:
        os.mkdir(lock)
    except FileExistsError:
        # Another process is building; wait for it rather than racing.
        for _ in range(240):
            time.sleep(0.5)
            if not os.path.isdir(lock):
                return
        return
    except OSError:
        return
    try:
        res = subprocess.run(["make", "-C", native_dir], timeout=240,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.PIPE, check=False)
        if res.returncode != 0:
            tail = (res.stderr or b"").decode(errors="replace")[-500:]
            print("quisquis_tpu: native build failed; using pure-Python "
                  f"fallbacks (slower). make said:\n{tail}", file=sys.stderr)
    except Exception as exc:  # toolchain oddities must never break import
        print(f"quisquis_tpu: native build errored ({exc!r}); using "
              "pure-Python fallbacks (slower)", file=sys.stderr)
    finally:
        try:
            os.rmdir(lock)
        except OSError:
            pass


def find_native_lib() -> Optional[str]:
    env = os.environ.get("QQ_NATIVE_LIB")
    if env:
        return env if os.path.exists(env) else None
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in sorted(glob.glob(os.path.join(pkg_dir, "libqq_native*.so"))):
        return cand
    native_dir = os.path.join(os.path.dirname(pkg_dir), "native")
    repo = os.path.join(native_dir, "libqq_native.so")
    if not os.path.exists(repo) and os.path.exists(
            os.path.join(native_dir, "Makefile")):
        _try_build(native_dir)
    if os.path.exists(repo):
        return repo
    return None
