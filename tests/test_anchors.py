"""Inbound anchor-text aggregation: golden counts/tie-breaks, and the
salted two-phase rank's output-identity with the plain window."""

from crawlspark.operators.anchors import aggregate_anchor_text


def _rows(df):
    return {r["dst"]: r.asDict() for r in df.collect()}


def test_anchor_golden(spark):
    edges = spark.createDataFrame(
        [
            (1, "click here"),
            (1, "click here"),
            (1, "home"),
            (1, "docs"),
            (2, "api"),
        ],
        ["dst", "anchor"],
    )
    out = _rows(aggregate_anchor_text(edges, k_top=2))
    assert out[1]["n_inlinks"] == 4
    assert out[1]["n_anchors"] == 3
    # count desc, then anchor asc: 'click here'(2), then 'docs' < 'home'
    assert out[1]["top_anchors"] == "click here|docs"
    assert out[2] == {"dst": 2, "n_inlinks": 1, "n_anchors": 1, "top_anchors": "api"}


def test_anchor_tie_break_is_lexicographic(spark):
    edges = spark.createDataFrame(
        [(1, a) for a in ["zeta", "alpha", "mid"]], ["dst", "anchor"]
    )
    out = _rows(aggregate_anchor_text(edges, k_top=2))
    assert out[1]["top_anchors"] == "alpha|mid"


def test_null_anchors_are_dropped(spark):
    from pyspark.sql.types import StringType, StructField, StructType, LongType

    schema = StructType([
        StructField("dst", LongType()), StructField("anchor", StringType()),
    ])
    edges = spark.createDataFrame(
        [(1, "home"), (1, None), (1, None), (2, None)], schema
    )
    out = _rows(aggregate_anchor_text(edges, k_top=2))
    assert out[1] == {"dst": 1, "n_inlinks": 1, "n_anchors": 1, "top_anchors": "home"}
    assert 2 not in out  # only NULL-anchor in-links → no signal row


def test_salted_rank_matches_plain_window(spark):
    # a skewed dst with many distinct anchors at varied counts, plus
    # normal dsts — the salted two-phase form must be output-identical
    rows = []
    for i in range(200):
        # anchor a{i%37} appears with frequency tied to i's residue
        for _ in range(1 + i % 5):
            rows.append((7, f"a{i % 37}"))
    for d in range(20):
        rows.append((d, f"x{d % 3}"))
    edges = spark.createDataFrame(rows, ["dst", "anchor"])
    plain = sorted(map(tuple, aggregate_anchor_text(edges, k_top=3, salt=1).collect()))
    salted = sorted(map(tuple, aggregate_anchor_text(edges, k_top=3, salt=8).collect()))
    assert plain == salted
