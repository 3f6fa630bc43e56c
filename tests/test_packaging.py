"""spark-submit --py-files packaging: the shipped zip must contain the
full crawlspark package so multi-executor masters (local-cluster / yarn
/ k8s) can unpickle our pandas UDFs. The end-to-end path is exercised
by the local-cluster crawl runs (bench_crawl --master local-cluster);
this pins the artifact's contents without paying a JVM spin-up."""

import zipfile

from crawlspark.session import package_pyfiles


def test_pyfiles_zip_contains_package(tmp_path):
    out = package_pyfiles(str(tmp_path / "pyfiles.zip"))
    names = set(zipfile.ZipFile(out).namelist())
    for mod in [
        "crawlspark/session.py",
        "crawlspark/functions/extract.py",
        "crawlspark/operators/politeness.py",
        "crawlspark/operators/bloom.py",
        "crawlspark/plans/epoch.py",
        "crawlspark/streaming/dedup.py",
    ]:
        assert mod in names, f"{mod} missing from --py-files artifact"
    assert all(n.startswith("crawlspark/") for n in names)
    assert not any(n.endswith(".pyc") for n in names)
