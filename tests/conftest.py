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
# NOTE: no persistent compile cache for CPU tests — XLA:CPU AOT entries are
# machine-feature-specific and this fleet mixes hosts (stale entries load with
# "could lead to SIGILL" warnings and can miscompute).

assert jax.device_count() >= 8, (jax.devices(), "expected virtual CPU mesh")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration tests")
