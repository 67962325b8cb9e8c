"""Test harness config: force a virtual 8-device CPU platform for JAX so
multi-chip sharding tests run without TPU hardware (analog of the reference's
test-backend-ops CPU-as-oracle strategy, SURVEY.md section 4)."""

import os
import sys

# must happen before jax import anywhere in the test process
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
