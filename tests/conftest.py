import os

# Force a virtual 8-device CPU mesh: multi-chip sharding is validated on host
# devices (no TPU needed in CI). Note the axon sitecustomize may have already
# imported jax and pinned jax_platforms="axon,cpu" at interpreter start, so an
# env-var default is not enough — override via jax.config before any backend
# initializes (backend init is lazy, so XLA_FLAGS set here still applies).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the slow integration tests are dominated
# by CPU XLA compiles of the full SLAM stack; cached executables make reruns
# finish in a fraction of the cold time.
from dqo_map_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(7)
