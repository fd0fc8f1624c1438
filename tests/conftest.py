import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_web():
    """Small synthetic web + KB shared by crawl tests."""
    from scrappy_ray.kb import load_kb
    from scrappy_ray.sources.testgen import SynthWebConfig, synth_kb_yaml

    cfg = SynthWebConfig(n_hosts=3, pages_per_host=12)
    return cfg, load_kb(synth_kb_yaml())


@pytest.fixture(scope="session")
def synth_pages_dir(tmp_path_factory, synth_web):
    from scrappy_ray.sources.testgen import generate_parquet

    cfg, _ = synth_web
    d = str(tmp_path_factory.mktemp("pages"))
    generate_parquet(cfg, d)
    return d
