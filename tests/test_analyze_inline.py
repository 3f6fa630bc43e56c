"""CrawlConfig.analyze: inline per-fetch text analysis equals the
standalone operators applied to the fetched text."""

from pyspark.sql import functions as F

from crawlspark.operators.textops import quality_micro, simhash64, token_count
from crawlspark.plans.epoch import CrawlConfig, web_crawl
from crawlspark.plans.state import CrawlState
from crawlspark.testdata import write_corpus


def test_inline_analysis_matches_operators(spark, tmp_path):
    d = str(tmp_path / "c")
    paths = write_corpus(spark, d, n_pages=100, n_hosts=5)
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])
    sd = str(tmp_path / "s")
    web_crawl(
        spark, pages, sd, seeds,
        config=CrawlConfig(default_budget=8, max_epochs=3, analyze=True),
    )
    fetched = CrawlState(sd).fetched.read(spark).where("status = 'ok'")
    assert fetched.count() > 0
    mismatches = fetched.where(
        (F.col("n_tokens") != token_count("text"))
        | (F.col("simhash") != simhash64(F.col("text")))
        | (F.col("quality_micro") != quality_micro("text"))
        | F.col("n_tokens").isNull()
    ).count()
    assert mismatches == 0
