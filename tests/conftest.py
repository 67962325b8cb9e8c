"""Test harness config: force a virtual 8-device CPU platform for JAX so
multi-chip sharding tests run without TPU hardware (analog of the reference's
test-backend-ops CPU-as-oracle strategy, SURVEY.md section 4)."""

import os
import sys

# Unit tests are the CPU oracle harness; the real chip is for bench.py only.
# jax may already be imported (pytest plugins) with JAX_PLATFORMS=axon baked
# into its config default, so override via jax.config — effective until the
# first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_GGUF_PY = "/root/reference/gguf-py"


def has_reference_oracle() -> bool:
    return os.path.isdir(REFERENCE_GGUF_PY)


@pytest.fixture(scope="session")
def gguf_py():
    """Reference numpy quant oracle (skip tests if checkout not present)."""
    if not has_reference_oracle():
        pytest.skip("reference gguf-py oracle not available")
    if REFERENCE_GGUF_PY not in sys.path:
        sys.path.insert(0, REFERENCE_GGUF_PY)
    import gguf  # type: ignore

    return gguf


def pytest_sessionstart(session):
    import jax

    print(f"\n[conftest] jax backend: {jax.default_backend()}, "
          f"devices: {len(jax.devices())}, platforms env: {os.environ.get('JAX_PLATFORMS')}")
