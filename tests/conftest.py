"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise multi-chip sharding logic without TPU hardware by running JAX
on CPU with ``xla_force_host_platform_device_count=8`` (SURVEY.md §4 test
strategy). Pallas kernels auto-fall back to interpret mode on CPU (see
ragfin_tpu.ops). The env vars must be set before the first ``import jax``
anywhere in the test process, hence this conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env filter; the config update
# is what actually pins the backend to CPU in this image.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root() -> str:
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference data not mounted")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def golden_chunks(reference_root):
    import json

    path = os.path.join(reference_root, "FinRag_knowledge_graph", "chunks.json")
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def corpus_chunks(reference_root):
    from ragfin_tpu.data.loader import build_corpus

    return build_corpus(os.path.join(reference_root, "extract_data"))
