"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` per the driver contract.
"""

import os

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

# persistent compilation cache: the limb-arithmetic graphs are large and
# dominate test wall-clock; cache them across runs (env var is not honored by
# this jax build, so use config.update)
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

# Block the zstandard cache codec BEFORE jax imports it: compressing the
# multi-MB device-verifier executables through zstandard.backend_c aborts
# the process mid-suite (glibc abort inside backend_compile_and_load with
# zstandard loaded; reproducible at tests/test_serving.py in a full run).
# jax's compilation cache falls back to zlib when the import fails.
import sys

sys.modules["zstandard"] = None  # type: ignore[assignment]
import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
