"""Test config: force JAX onto a virtual 8-device CPU platform so multi-chip
sharding tests run without TPU hardware (the JAX idiom replacing the
reference's 2-physical-GPU SyncBN test requirement,
segmentation/lib/net/sync_batchnorm/tests/test_sync_batchnorm.py).

NOTE: this environment registers a TPU backend via sitecustomize and exports
JAX_PLATFORMS — `jax.config.update` after import is the reliable override.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Machine-local cache dir: a cache shared across heterogeneous hosts (e.g. a
# /tmp that survives image snapshots) aborts XLA on AOT feature mismatch.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from wseg_tpu.utils.jaxsetup import _machine_tag  # noqa: E402 (no jax import)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_test_cache_{_machine_tag()}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# env vars can be pre-empted by the TPU sitecustomize importing jax first;
# config updates always stick
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
