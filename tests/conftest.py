"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a single host via
`--xla_force_host_platform_device_count=8` (the cluster-free path; see
SURVEY.md §4). Must run before the first `import jax`.
"""

import os

# Force the CPU backend (the sandbox presets JAX_PLATFORMS=axon -> real TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize registers the axon TPU plugin in every process
# and env forces JAX_PLATFORMS=axon; config.update after import wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# This sandbox has a single CPU core: XLA-CPU compiles of the solver scans
# take minutes. The persistent cache amortizes them across test runs.
# Host-keyed so AOT blobs from a previous sandbox host can't SIGILL here.
from hybridode.utils.cache import host_keyed_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  host_keyed_cache_dir(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
