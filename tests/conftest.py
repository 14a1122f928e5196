"""Force tests onto a virtual 8-device CPU mesh (the TPU-native analogue of
multi-node simulation — see SURVEY.md §4), with a persistent compilation cache
so reruns skip XLA compiles."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The machine profile's axon TPU plugin overrides JAX_PLATFORMS — force the
# CPU platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: keep this cache separate from the TPU bench cache — the axon tunnel's
# remote compile helper emits XLA:CPU AOT artifacts for a different host
# machine, and reusing them locally miscomputes (or SIGILLs).
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() >= 8, (jax.devices(), "expected virtual CPU mesh")
