"""Compute kernels: field/point/MSM ops, hashing, exact host backend.

The jax-backed modules (field, point, msm, batch, and the device/pallas
twins) load lazily (PEP 562): host-only consumers — the daemon client,
serde, the address CLI, worker processes that never touch the device —
import the package without paying the multi-second jax import.
"""

from . import exact, keccak, strobe  # noqa: F401  (host-side, jax-free)

_LAZY = ("field", "point", "msm", "batch", "scalar_field",
         "pallas_field", "pallas_point", "pallas_keccak",
         "device_keccak", "device_strobe")


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
