import os
import sys

# Force CPU JAX with a virtual 8-device mesh so sharding tests run without TPUs.
# The env var alone is not enough: a sitecustomize on PYTHONPATH may import jax
# at interpreter startup with JAX_PLATFORMS=axon already set, freezing the
# config before this file runs.  jax.config.update works as long as no backend
# has been initialised yet (no jax.devices() call), which holds at collection
# time.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "shared"))


@pytest.fixture(scope="session")
def reference_path():
    """Put the upstream reference repo on sys.path for differential oracles."""
    if not has_reference():
        pytest.skip("reference repo not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
