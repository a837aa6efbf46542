import pytest


@pytest.fixture(scope="session", autouse=True)
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

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 400-doc F1 corpus, generated once per session."""
    from elasticsearch_assets_ray.corpus.synth import write_corpus

    return str(write_corpus(tmp_path_factory.mktemp("corpus") / "c400", 400, rows_per_file=100))


@pytest.fixture(scope="session")
def small_index(small_corpus, tmp_path_factory):
    """Index over small_corpus: 8 partitions (50 docs), 4 shards (100 docs)."""
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    idx = tmp_path_factory.mktemp("index") / "idx400"
    info = build_index(
        small_corpus,
        idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100),
    )
    return info


@pytest.fixture(scope="session")
def small_oracle(small_corpus):
    from elasticsearch_assets_ray.search.oracle import BM25Oracle

    return BM25Oracle.from_parquet(small_corpus, analyzer="code")
