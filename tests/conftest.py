"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_tables():
    """(web_pages, expected) Arrow tables at smoke scale."""
    from rika_ray.corpus import generate_corpus

    return generate_corpus(n_per_family=3, seed=42)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """On-disk smoke corpus (web_pages.parquet + expected_extractions.parquet)."""
    from rika_ray.corpus import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_per_family=3, seed=42)
    return str(d)
