"""Test configuration: force an 8-device virtual CPU platform BEFORE jax init.

Mirrors the reference's hardware-independent CPU test strategy
(`tests/` run on CPU in CI; reference utils/model_utils.py:15 gates cuda),
and additionally provides a virtual multi-device mesh so pjit/shard_map
sharding is exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize forces the TPU backend regardless of JAX_PLATFORMS;
# the config update below is what actually pins tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compile cache cuts test reruns (see utils/jax_setup.py).
from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(8888)


@pytest.fixture(scope="session")
def fixture_dataset(tmp_path_factory):
    """Synthetic tiny dataset in the reference fixture layout (small feature dim)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts", "dataset"))
    from make_test_fixtures import make_fixtures

    d = tmp_path_factory.mktemp("dataset")
    return make_fixtures(str(d), att_feat_size=16, max_regions=5)


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """A tiny caption corpus file shared across tokenizer/data tests."""
    d = tmp_path_factory.mktemp("corpus")
    path = d / "train_captions.txt"
    caps = [
        "a man riding a horse on a beach",
        "a dog sitting on a couch",
        "a man with a dog in a park",
        "two dogs playing with a ball",
        "a horse standing in a field",
        "a group of people riding horses",
    ]
    path.write_text("\n".join(caps) + "\n")
    return str(path)
