import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    # symmetric teardown: only shut down a session THIS fixture
    # started — a driver that ran ray.init() before invoking pytest
    # owns its session and must not lose it under teardown
    started_here = not ray.is_initialized()
    if started_here:
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
        )
    yield
    if started_here:
        ray.shutdown()
