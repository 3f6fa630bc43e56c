"""Depth-scoped logging (ConsoleLogger.cs:11-15 verbose gate,
DepthLogger.cs:17-45 two-space indent scopes) and its wiring into the
download plan."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark.logging import DepthLogger, NullLogger  # noqa: E402


def test_indent_scopes_and_verbose_gate():
    lines = []
    log = DepthLogger(lines.append, verbose=False)
    log.info("Downloading catalog index")
    log.debug("hidden")  # below the Information threshold
    with log.indent():
        log.info("Found {} pages", 3)
        with log.indent():
            log.info("leaf {}", "a")
    log.info("done")
    assert lines == [
        "Downloading catalog index",
        "  Found 3 pages",
        "    leaf a",
        "done",
    ]


def test_verbose_enables_debug():
    lines = []
    log = DepthLogger(lines.append, verbose=True)
    log.debug("Configuration:")
    with log.indent():
        log.debug("Depth: {}", "leaf")
    assert lines == ["Configuration:", "  Depth: leaf"]


def test_null_logger_swallows_everything():
    log = NullLogger()
    log.info("x {}", 1)
    log.debug("y")
    with log.indent():
        log.info("z")  # no exception, no output


def test_download_logs_scoped_tree(spark, tmp_path):
    """A 2-depth (index→page→leaf) download emits the reference's log
    tree: index at depth 0, page count at depth 1, leaves at depth 2
    (Downloader.cs:93,123,151)."""
    from crawlspark.plans.epoch import catalog_crawl
    from tests.test_paths import _mini_catalog

    pages, idx = _mini_catalog(spark)
    lines = []
    catalog_crawl(
        spark, pages, idx, str(tmp_path / "state"), depth="leaf",
        logger=DepthLogger(lines.append, verbose=True),
    )
    assert "Configuration:" in lines
    assert "Downloading catalog index" in lines
    assert "  Found 2 pages with new data." in lines
    assert "  Processing 2 catalog pages" in lines
    assert "    Downloaded 4 catalog leaves" in lines
    # non-verbose: config + Found debug lines disappear, info tree stays
    quiet = []
    catalog_crawl(
        spark, pages, idx, str(tmp_path / "state2"), depth="leaf",
        logger=DepthLogger(quiet.append, verbose=False),
    )
    assert "Configuration:" not in quiet
    assert "Downloading catalog index" in quiet
    assert "    Downloaded 4 catalog leaves" in quiet
