"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on XLA's host platform with 8 virtual devices (same trick the driver's
dryrun uses). Must be set before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the ambient axon/TPU platform
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize partially imports jax at interpreter startup, which
# bakes JAX_PLATFORMS before this file runs — override through the config API
# too (harmless when the env var was enough).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def vocab_path(tmp_path_factory):
    """A small vocab.txt in the reference's `<token> <id>` format."""
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    tokens = {
        0: "<unk>", 1: "▁t", 2: "▁th", 3: "▁a", 4: "in",
        5: "▁the", 6: "re", 7: "▁w", 8: "▁o", 9: "▁s",
        10: "at", 11: "ou", 12: "er", 13: "nd", 14: "▁i",
    }
    path.write_text("\n".join(f"{t} {i}" for i, t in tokens.items()),
                    encoding="utf-8")
    return str(path)
