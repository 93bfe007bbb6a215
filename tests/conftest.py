"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` per the driver contract.
"""

import os
import sys

# QQ_TPU_TESTS=1 leaves the real accelerator visible so
# tests/test_tpu_hardware.py can gate bit-exactness on the actual chip:
#   QQ_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
_TPU_MODE = os.environ.get("QQ_TPU_TESTS") == "1"

# force CPU: the environment pins JAX_PLATFORMS to the TPU plugin, and the
# plugin ignores the env var — jax.config.update below is what sticks
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the limb-arithmetic graphs are large and
# dominate test wall-clock; cache them across runs. The directory is the
# ONE shared cache (utils.jaxcache) also used by benchmarks/serving/CLI.
from quisquis_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled executables after each test module.

    A single monolithic run compiles hundreds of XLA:CPU executables —
    several of them (the one-program device verifiers/provers) tens of MB
    of JITed code each. Keeping every one alive in one process eventually
    segfaults LLVM/XLA during a *later* compile (reproduced at
    test_serving's device-batched shuffle compile after ~135 tests; the
    identical compile succeeds in a fresh process). Dropping jax's jit
    caches at module boundaries frees the executables (and their code
    memory); subsequent modules reload from the persistent cache, so the
    wall-clock cost is small.
    """
    yield
    jax.clear_caches()
    # the device dispatcher instance caches hold jitted callables whose
    # specializations clear_caches() just dropped; drop the instances too
    # so nothing pins stale executables
    try:
        from quisquis_tpu.shuffle import device_verify as _sdv
        from quisquis_tpu.shuffle import device_prove as _sdp

        _sdv._VERIFIER_CACHE.clear()
        _sdp._PROVER_CACHE.clear()
    except Exception:
        pass
    try:
        from quisquis_tpu.bulletproofs import device_verify as _bdv
        from quisquis_tpu.bulletproofs import device_prove as _bdp

        _bdv._VERIFIER_CACHE.clear()
        _bdp._PROVER_CACHE.clear()
    except Exception:
        pass
    import gc

    gc.collect()
