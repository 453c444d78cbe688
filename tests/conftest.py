import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs TPU).
# The environment's sitecustomize pre-registers the 'axon' TPU backend and
# pins jax_platforms, so override the config explicitly (env vars alone are
# read too early/late to take effect here).
os.environ["JAX_PLATFORMS"] = "cpu"
# keep the CLI's auto device-fill probe from forking jax-importing service
# processes in every CLI test; fill-service tests opt back in explicitly
os.environ.setdefault("VACMAP_TPU_NO_FILL_SERVER", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def testdata_dir():
    return "/root/reference/testdata"


def random_dna(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


@pytest.fixture(scope="session")
def small_genome(rng):
    """A 60 kb two-contig genome for index/pipeline tests."""
    return {
        "c1": random_dna(rng, 40_000),
        "c2": random_dna(rng, 20_000),
    }
