from __future__ import annotations

import logging
import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.preserve_order = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages(tmp_path_factory):
    """1k-page deterministic pages table + golden edges (seed 42)."""
    from xdata_igraph_ray.sources.synth import generate_pages

    out = str(tmp_path_factory.mktemp("pages_tiny"))
    paths = generate_pages(out, n_pages=1000, seed=42)
    return paths


@pytest.fixture(scope="session")
def _quiet_env():
    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
