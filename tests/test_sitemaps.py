"""Sitemap XML parsing goldens: urlset vs sitemapindex, CDATA, CRLF,
uppercase tags, junk priority, empty documents — and the guard that the
parse stays expression-only (no UDF, no shuffle)."""

from crawlspark.operators.sitemaps import parse_sitemaps

BODIES = [
    (
        "a.example",
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a.example/p1</loc><lastmod>2024-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>\n"
        "<url><loc> https://a.example/p2 </loc></url>\n"
        "</urlset>",
    ),
    (
        "b.example",
        "<sitemapindex><sitemap><loc>https://b.example/s1.xml</loc>"
        "<lastmod>2024-02-03T04:05:06+00:00</lastmod></sitemap>"
        "<sitemap><loc>https://b.example/s2.xml</loc></sitemap></sitemapindex>",
    ),
    (
        "c.example",
        "<urlset><url><loc><![CDATA[https://c.example/x?a=1&b=2]]></loc>"
        "<priority>1.0</priority></url></urlset>",
    ),
    ("d.example", "<urlset></urlset>"),
    (
        "e.example",
        "<URLSET>\r\n<URL><LOC>https://e.example/up</LOC>"
        "<PRIORITY>junk</PRIORITY></URL>\r\n</URLSET>",
    ),
]


def _parsed(spark):
    df = spark.createDataFrame(BODIES, "host string, sitemap_xml string")
    return parse_sitemaps(df)


def test_parse_sitemaps_goldens(spark):
    rows = {(r.host, r.loc): r for r in _parsed(spark).collect()}
    assert set(rows) == {
        ("a.example", "https://a.example/p1"),
        ("a.example", "https://a.example/p2"),
        ("b.example", "https://b.example/s1.xml"),
        ("b.example", "https://b.example/s2.xml"),
        ("c.example", "https://c.example/x?a=1&b=2"),
        ("e.example", "https://e.example/up"),
    }
    full = rows[("a.example", "https://a.example/p1")]
    assert (full.kind, full.lastmod, full.changefreq, full.priority_milli) == (
        "urlset", "2024-01-02", "daily", 800,
    )
    bare = rows[("a.example", "https://a.example/p2")]
    assert (bare.lastmod, bare.changefreq, bare.priority_milli) == (None, None, None)
    assert rows[("b.example", "https://b.example/s1.xml")].kind == "sitemapindex"
    assert rows[("c.example", "https://c.example/x?a=1&b=2")].priority_milli == 1000
    # junk priority → NULL, uppercase/CRLF tags still parse
    assert rows[("e.example", "https://e.example/up")].priority_milli is None


def test_parse_sitemaps_is_expression_only(spark):
    plan = _parsed(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan  # projection + generate, no shuffle
    # the regexp battery must be evaluated once, not cloned into an
    # inferred pre-filter (why the parse uses explode_outer)
    assert plan.count("lambdafunction") == 1


def test_seeds_from_sitemaps_priority_mapping(spark):
    from crawlspark.operators.sitemaps import seeds_from_sitemaps

    seeds = {r.url: r.priority for r in seeds_from_sitemaps(_parsed(spark)).collect()}
    assert seeds == {
        "https://a.example/p1": 200,     # 0.8 → 1000-800
        "https://a.example/p2": 500,     # absent → default 0.5
        "https://c.example/x?a=1&b=2": 0,  # 1.0 dequeues first
        "https://e.example/up": 500,     # junk priority → default
    }  # sitemapindex locs excluded


def test_schedule_recrawl_reasons(spark):
    import datetime as dt

    from crawlspark.operators.sitemaps import schedule_recrawl

    entries = spark.createDataFrame(
        [
            # (host, kind, loc, lastmod, changefreq, priority_milli)
            ("h", "urlset", "u/new", None, None, 900),
            ("h", "urlset", "u/modified", "2024-06-01", "never", None),
            ("h", "urlset", "u/stale-daily", None, "daily", 100),
            ("h", "urlset", "u/fresh-daily", None, "daily", None),
            ("h", "urlset", "u/never-unchanged", "2024-01-01", "never", None),
            ("h", "urlset", "u/stale-default", None, None, None),  # unknown freq
            ("h", "sitemapindex", "u/index-entry", None, None, None),  # excluded
        ],
        "host string, kind string, loc string, lastmod string, "
        "changefreq string, priority_milli int",
    )
    fetched = spark.createDataFrame(
        [
            ("u/modified", dt.datetime(2024, 5, 1)),
            ("u/stale-daily", dt.datetime(2024, 6, 9)),
            ("u/fresh-daily", dt.datetime(2024, 6, 10, 6, 0)),
            ("u/never-unchanged", dt.datetime(2024, 5, 1)),
            ("u/stale-default", dt.datetime(2024, 5, 1)),  # 40 days > week
        ],
        "url string, fetch_ts timestamp",
    )
    out = {
        r.url: (r.priority, r.reason)
        for r in schedule_recrawl(entries, fetched, "2024-06-10 12:00:00").collect()
    }
    assert out == {
        "u/new": (100, "new"),                 # 1000-900
        "u/modified": (500, "modified"),       # lastmod beats 'never'
        "u/stale-daily": (900, "stale"),
        "u/stale-default": (500, "stale"),     # default weekly interval
    }  # fresh-daily and never-unchanged are not due; index rows excluded


def test_out_of_range_priority_is_ignored(spark):
    from crawlspark.operators.sitemaps import parse_sitemaps, seeds_from_sitemaps

    df = spark.createDataFrame(
        [("h", "<urlset>"
               "<url><loc>u/hostile</loc><priority>9.9</priority></url>"
               "<url><loc>u/negative</loc><priority>-0.5</priority></url>"
               "<url><loc>u/edge-hi</loc><priority>1.0</priority></url>"
               "<url><loc>u/edge-lo</loc><priority>0.0</priority></url>"
               "</urlset>")],
        "host string, sitemap_xml string",
    )
    parsed = {r.loc: r.priority_milli for r in parse_sitemaps(df).collect()}
    # out-of-protocol-range priorities must not jump (or sink below) the
    # frontier queue — they fall back to NULL → the 0.5 default
    assert parsed == {"u/hostile": None, "u/negative": None,
                      "u/edge-hi": 1000, "u/edge-lo": 0}
    seeds = {r.url: r.priority for r in seeds_from_sitemaps(parse_sitemaps(df)).collect()}
    assert seeds == {"u/hostile": 500, "u/negative": 500,
                     "u/edge-hi": 0, "u/edge-lo": 1000}
