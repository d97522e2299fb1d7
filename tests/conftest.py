"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes a backend.
"""
import os

# Force the CPU backend with 8 virtual devices. The axon TPU plugin
# (sitecustomize) would otherwise grab the backend regardless of
# JAX_PLATFORMS; clearing PALLAS_AXON_POOL_IPS disables it.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: XLA:CPU compiles of the jitted train/infer
# steps dominate suite time (tens of minutes on a small-core box); cached
# executables make re-runs fast. Propagates to subprocess tests via env.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_dctpu_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax

# The axon plugin sets jax_platforms="axon,cpu" via jax.config at interpreter
# startup; override it back to CPU-only for the test suite.
jax.config.update("jax_platforms", "cpu")
# The sitecustomize plugin also imports jax BEFORE this file runs, so the
# JAX_COMPILATION_CACHE_DIR env var above is read too late (jax config
# defaults bind env at import) — set the config explicitly or the persistent
# cache silently never initializes (found round 4: every suite run was
# recompiling everything).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# True fp32 matmuls for parity tests (JAX's default CPU path may use a
# lower-precision dot that costs ~1e-2 absolute error).
jax.config.update("jax_default_matmul_precision", "highest")

import sys

REFERENCE_ROOT = "/root/reference"
if os.path.isdir(REFERENCE_ROOT) and REFERENCE_ROOT not in sys.path:
    # Reference torch implementation used as a parity ORACLE in tests only.
    sys.path.insert(0, REFERENCE_ROOT)

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
