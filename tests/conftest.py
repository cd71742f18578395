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

# ---------------------------------------------------------------------
# Test tiering (VERDICT r3 item 4): `pytest -m fast` = every
# reference-oracle parity test + kernel test, cold-cache green in
# <5 min on one core; `-m slow` = the compile-heavy pipeline / tracker
# / training / device / e2e tests.  Everything not listed below is
# marked fast.
import pytest  # noqa: E402

SLOW_MODULES = {
    "test_batched_pipeline",   # full AmodalPipeline compiles
    "test_deep_trackers",      # deep-feature online trackers
    "test_device_eval",        # device evaluators (big programs)
    "test_device_tolerance",
    "test_discriminative",     # online GN-CG/GD-L2 tracker loops
    "test_hp_search",          # vmapped HP grid over a tracker
    "test_models",             # full flax model forwards
    "test_parallel",           # 8-device mesh + 2-process smoke
    "test_paste_n_occlude",
    "test_pipeline_e2e",       # train->infer->eval closed loop
    "test_preproc",            # pallas preproc kernels (interpret)
    "test_resnet_blocks",      # pallas resnet kernels (interpret)
    "test_roi",                # prroi fwd+bwd oracle compiles
    "test_run_video",
    "test_siammask",
    "test_sort_scan_pallas",   # whole-clip pallas sort kernel (interpret)
    "test_sot_harness",        # tracker-on-sequence harnesses
    "test_sot_train",
    "test_torch_convert",      # full detector conversion parity
    "test_tp",                 # tensor-parallel train step vs oracle
    "test_scale_rehearsal",    # fixture->infer->eval dress run
    "test_sharded_streaming",  # 8-lane mesh serving vs solo oracle
    "test_fused_stage",        # pallas fused trunk chain (interpret)
    "test_trackers",           # siamrpn/longterm per-frame programs
    "test_training",           # detector/siamese train steps
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        mark = "slow" if mod in SLOW_MODULES else "fast"
        item.add_marker(getattr(pytest.mark, mark))
