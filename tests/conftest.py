import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawlspark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_dir(spark, tmp_path_factory):
    """Small deterministic corpus shared by the crawl tests."""
    from crawlspark.testdata import write_corpus

    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(spark, d, n_pages=400, n_hosts=12, leaves_per_commit=8, commits_per_page=4)
    return d


@pytest.fixture(scope="session")
def staged_dir(spark, tmp_path_factory):
    from crawlspark.testdata import write_staged_corpus

    d = str(tmp_path_factory.mktemp("staged"))
    write_staged_corpus(spark, d, n_hosts=6)
    return d


@pytest.fixture(scope="session")
def crawl_run(spark, corpus_dir, tmp_path_factory):
    """One full crawl to frontier exhaustion, shared across test modules
    (engine-vs-simulator parity, invariants, gzip byte-identity)."""
    from crawlspark.plans.epoch import CrawlConfig, web_crawl

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(corpus_dir, "seeds.parquet"))
    robots = spark.read.parquet(os.path.join(corpus_dir, "robots.parquet"))
    budgets = spark.read.parquet(os.path.join(corpus_dir, "host_budgets.parquet"))
    state_dir = str(tmp_path_factory.mktemp("state") / "run")
    stats = web_crawl(
        spark, pages, state_dir, seeds, robots=robots, host_budgets=budgets,
        config=CrawlConfig(default_budget=8, max_epochs=20),
    )
    return state_dir, stats


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
