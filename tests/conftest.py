import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """ONE Ray session for the whole pytest run (see repo instructions)."""
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as _rd

    ctx = _rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_300():
    from solr_ray.fixtures import gen_pages

    return gen_pages(300, seed=42)


@pytest.fixture(scope="session")
def pages_300_path():
    from solr_ray.fixtures import pages_path

    return pages_path(300, seed=42)


@pytest.fixture(scope="session")
def queries_40():
    from solr_ray.fixtures import gen_queries

    return gen_queries(40, seed=42)
