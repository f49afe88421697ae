"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

This is the standard JAX substitute for multi-chip testing (SURVEY.md §4):
sharding/shard_map tests run against 8 virtual CPU devices.
"""

import os
import sys

# Hard override: the environment may pin JAX_PLATFORMS to a TPU plugin;
# unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize hook registers a TPU PJRT plugin at interpreter
# start and sets jax_platforms *programmatically*, which overrides the
# JAX_PLATFORMS env var. Re-assert CPU via jax.config (backends init lazily,
# so this takes effect as long as no jax.devices() call happened yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the suite (VERDICT r2 weak-7: the full
# suite took 70-80 min, dominated by repeated CPU XLA compiles). First run
# pays the compiles; later runs (and re-runs of single files while
# iterating) hit the disk cache. Keyed separately from the TPU cache.
# Portable location: XDG cache (env-overridable), not a hard-coded /root.
_cache_root = os.environ.get(
    "DIFFSPECTRA_TEST_COMPILE_CACHE",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "jax_comp_tests",
    ),
)
jax.config.update("jax_compilation_cache_dir", _cache_root)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
