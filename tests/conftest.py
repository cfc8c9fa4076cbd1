"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere, so this lives at the
very top of conftest (pytest imports conftest before test modules).
"""

import os
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config route
# does force the host CPU backend (8 virtual devices via XLA_FLAGS above).
jax.config.update("jax_platforms", "cpu")

# The synthetic numerics gates (test_match_quality etc.) are built
# around deterministic random-weight matchers; deployments default to
# the bundled self-trained checkpoints instead (matchers.py
# _force_random_weights). Tests that want the bundled weights pass
# explicit paths or monkeypatch this away.
os.environ.setdefault("ICEPY4D_RANDOM_WEIGHTS", "1")

import pytest  # noqa: E402

REFERENCE_ASSETS = Path("/root/reference/assets")


@pytest.fixture(scope="session")
def assets_dir() -> Path:
    if not REFERENCE_ASSETS.exists():
        pytest.skip("reference assets not available")
    return REFERENCE_ASSETS


@pytest.fixture(scope="session")
def calib_file(assets_dir) -> Path:
    return assets_dir / "calib" / "cam1.txt"
