"""Session-scoped Ray init (one cluster for the whole pytest run)."""

import pytest


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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def quiet_data_context(ray_session):
    from textalyzer_ray.context import tune_data_context

    return tune_data_context()
