"""Force tests onto a virtual 8-device CPU mesh (the TPU-native analogue of
multi-node simulation — see SURVEY.md §4), with a persistent compilation cache
so reruns skip XLA compiles."""
import os

# FORCE cpu: the machine profile exports JAX_PLATFORMS=axon (the TPU tunnel),
# but the test suite is designed for the virtual multi-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: keep this cache separate from the TPU bench cache — the axon tunnel's
# remote compile helper emits XLA:CPU AOT artifacts for a different host
# machine, and reusing them locally miscomputes (or SIGILLs).
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
