import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_API = "/root/reference/api/python"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def reference_tbpu():
    """Import the reference's own tbpu package (read-only) for parity checks."""
    if REFERENCE_API not in sys.path:
        sys.path.insert(0, REFERENCE_API)
    import tbpu  # noqa: F401

    return tbpu


@pytest.fixture(scope="session")
def sf0001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.01"
