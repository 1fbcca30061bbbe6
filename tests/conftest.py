import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_pages_dir(tmp_path_factory):
    """FIXTURES.md `small` corpus: deterministic pages + gold tables."""
    from ner_extractor_ray.sources.pages import write_pages

    d = tmp_path_factory.mktemp("pages_small")
    write_pages(str(d), 300, seed=42, n_files=4)
    return str(d)
