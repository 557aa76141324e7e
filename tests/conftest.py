"""Test configuration: force an 8-device virtual CPU mesh.

TPU hardware in CI is a single chip; multi-chip sharding is validated on a
virtual CPU mesh (``xla_force_host_platform_device_count``), mirroring how
the driver dry-runs ``dryrun_multichip``.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# the environment's sitecustomize pins JAX_PLATFORMS to the TPU tunnel;
# config.update is the override that actually sticks
jax.config.update("jax_platforms", "cpu")

# NOTE: do not enable the persistent compilation cache here — XLA:CPU AOT
# artifacts can carry machine features the host lacks and SIGILL on reload
# (observed with "+prefer-no-gather"). The TPU-side bench keeps its own cache.


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_vectors(rng, n, d):
    return rng.standard_normal((n, d)).astype(np.float32)
