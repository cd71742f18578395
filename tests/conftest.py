"""Test harness config.

Forces JAX onto a virtual 8-device CPU mesh *before* jax is imported, so
multi-chip sharding tests run anywhere (the TPU-native equivalent of a
fake distributed backend — see SURVEY.md §4).
"""

import os

# Hard-set (not setdefault): the session env may preselect a TPU
# platform; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: repeated test runs skip recompiles.
import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and
# force-sets jax_platforms to "axon,cpu" — override it back AFTER the
# import so tests really run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
assert jax.device_count() >= 8, jax.devices()
