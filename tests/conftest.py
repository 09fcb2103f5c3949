"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding is
exercised without TPU hardware (reference has no distributed tests at all —
SURVEY.md §4). Must run before jax is imported anywhere.
"""
import os

# The ambient environment pins JAX_PLATFORMS to the TPU plugin; tests must
# run on host CPU, so override (not setdefault) before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: repeat runs of the heavy jit tests (train-step
# compiles in test_dp_equivalence / test_train_smoke) drop from minutes to
# seconds; the cache dir is gitignored
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
