"""WARC source round-trips: archive write → scan → identical pages;
CDX random access; corrupt-member degradation."""

import gzip
import os

from pyspark.sql import functions as F

from crawlspark.sources.warc import fetch_cdx_records, read_warc, write_warc


def _pages(spark, corpus_dir):
    return (
        spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
        .select("url", "warc_ts", "html")
    )


def _as_set(df):
    return {(r["url"], r["warc_ts"], bytes(r["html"])) for r in df.collect()}


def test_warc_roundtrip_is_exact(spark, corpus_dir, tmp_path):
    pages = _pages(spark, corpus_dir)
    out = str(tmp_path / "warc")
    cdx = write_warc(pages, out, n_files=4)

    assert cdx.count() == pages.count()
    got = read_warc(spark, out)
    assert _as_set(got.select("url", "warc_ts", "html")) == _as_set(pages)


def test_warc_bytes_are_deterministic(spark, corpus_dir, tmp_path):
    """Same input set → byte-identical archives, regardless of input
    partitioning (the writer sorts within each url-hash file)."""
    pages = _pages(spark, corpus_dir)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(pages, a, n_files=3)
    write_warc(pages.repartition(11), b, n_files=3)
    names = sorted(n for n in os.listdir(a) if n.endswith(".warc.gz"))
    assert names == sorted(n for n in os.listdir(b) if n.endswith(".warc.gz"))
    for n in names:
        assert open(os.path.join(a, n), "rb").read() == open(os.path.join(b, n), "rb").read()


def test_cdx_random_access_fetches_exact_records(spark, corpus_dir, tmp_path):
    pages = _pages(spark, corpus_dir)
    out = str(tmp_path / "warc")
    cdx = write_warc(pages, out, n_files=4)

    want = cdx.orderBy("url").limit(17)
    got = fetch_cdx_records(spark, want, out)
    assert _as_set(got.select("url", "warc_ts", "html")) == _as_set(
        pages.join(want.select("url"), "url")
    )
    # offsets in the scan and the CDX agree
    scan = read_warc(spark, out).select("url", "warc_file", "record_offset")
    assert (
        scan.join(cdx, ["url", "warc_file", "record_offset"]).count() == pages.count()
    )


def test_corrupt_member_degrades_that_file_tail_only(spark, corpus_dir, tmp_path):
    """Flipping bytes mid-archive loses records from that member on (no
    CDX to resync without) but never fails the task, and other archives
    are untouched."""
    pages = _pages(spark, corpus_dir)
    out = str(tmp_path / "warc")
    cdx = write_warc(pages, out, n_files=4).collect()

    victim = sorted({r["warc_file"] for r in cdx})[0]
    victim_rows = sorted(
        (r for r in cdx if r["warc_file"] == victim), key=lambda r: r["record_offset"]
    )
    cut = victim_rows[len(victim_rows) // 2]  # corrupt the middle member
    path = os.path.join(out, victim)
    blob = bytearray(open(path, "rb").read())
    blob[cut["record_offset"]] ^= 0xFF  # break the member's gzip magic
    open(path, "wb").write(bytes(blob))

    got = read_warc(spark, out)
    kept = {r["url"] for r in got.select("url").collect()}
    lost = {r["url"] for r in victim_rows[len(victim_rows) // 2 :]}
    assert kept == {r["url"] for r in cdx} - lost
    assert lost and lost.isdisjoint(kept)


def test_read_warc_skips_non_response_records(spark, tmp_path):
    """A leading warcinfo member (real Common Crawl files carry one) is
    skipped; offsets of later records still line up."""
    out = tmp_path / "warc"
    out.mkdir()
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    html = b"<p>x</p>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html)
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://h/a\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    with open(out / "part-00000.warc.gz", "wb") as f:
        f.write(gzip.compress(warcinfo, mtime=0))
        f.write(gzip.compress(resp, mtime=0))

    rows = read_warc(spark, str(out)).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://h/a"
    assert bytes(rows[0]["html"]) == html
    assert str(rows[0]["warc_ts"]) == "2026-01-02 03:04:05"


def test_revisit_dedup_roundtrip(spark, corpus_dir, tmp_path):
    """dedup_revisits: one response per distinct payload (earliest
    (ts, url) wins), revisit records for the rest, smaller archive."""
    import pandas as pd

    base = _pages(spark, corpus_dir).limit(20)
    # duplicate every payload under a different url, one hour later
    dup = base.select(
        F.concat(F.col("url"), F.lit("?mirror=1")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        "html",
    )
    pages = base.unionByName(dup)
    out = str(tmp_path / "warc_dedup")
    cdx = write_warc(pages, out, n_files=3, dedup_revisits=True)
    types = {r["record_type"]: r["n"]
             for r in cdx.groupBy("record_type").agg(F.count("*").alias("n")).collect()}
    n_payloads = base.select(F.sha1("html")).distinct().count()
    assert types["response"] == n_payloads
    assert types["response"] + types["revisit"] == pages.count()
    # reader returns exactly the canonical responses, payloads intact
    got = _as_set(read_warc(spark, out).select("url", "warc_ts", "html"))
    canon = {
        min(g)  # (ts, url) min == earliest fetch
        for _, g in pd.DataFrame(
            [(r["url"], r["warc_ts"], bytes(r["html"])) for r in pages.collect()],
            columns=["u", "t", "h"],
        ).assign(d=lambda x: x.h.map(hash)).groupby("d").apply(
            lambda g: [(t, u, h) for u, t, h in zip(g.u, g.t, g.h)]
        ).items()
    }
    assert got == {(u, t, h) for t, u, h in canon}
    # raw bytes: revisit records carry the profile + refers-to headers
    blob = b""
    for f in sorted(os.listdir(out)):
        if f.endswith(".warc.gz"):
            with open(os.path.join(out, f), "rb") as fh:
                blob += gzip.decompress(fh.read())
    assert blob.count(b"WARC-Type: revisit") == types["revisit"]
    assert b"identical-payload-digest" in blob
    assert b"WARC-Refers-To-Target-URI: " in blob
    # dedup'd archive is smaller (the saving is the duplicate payload
    # bytes; the test corpus's ~2 KB pages compress well, so headers
    # dominate and the ratio is modest here — at real page sizes the
    # payload term dominates)
    full = str(tmp_path / "warc_full")
    write_warc(pages, full, n_files=3)
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d) if f.endswith(".warc.gz"))
    assert size(out) < size(full)


def test_revisit_off_keeps_old_behavior(spark, corpus_dir, tmp_path):
    pages = _pages(spark, corpus_dir).limit(10)
    out = str(tmp_path / "warc_plain")
    cdx = write_warc(pages, out, n_files=2)
    assert {r["record_type"] for r in cdx.collect()} == {"response"}
    assert _as_set(read_warc(spark, out).select("url", "warc_ts", "html")) == _as_set(pages)
