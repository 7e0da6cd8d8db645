"""Parity: the Catalyst canonicalizer must equal the pure-Python one."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.canonical import canonicalize_url, canonicalize_url_col, host_of, host_of_py

CASES = [
    "https://m.sizebid-test.local/detail/123.html",
    "HTTP://Ex.COM:80/a?b=2&a=1#frag",
    "https://Host.Local:443/p/q.html?z=1&y=2&x=3",
    "https://host.local:8443/keep/port",
    "http://host.local",
    "http://host.local/?",
    "https://api.dz100-test.local/api/bid/detail?id=9&src=pro",
    "  https://pad.local/x  ",
    "relative/path.html",
    "https://h.local/a%20b?q=%E4%B8%AD",
]


def test_python_contract():
    assert canonicalize_url("HTTP://Ex.COM:80/a?b=2&a=1#frag") == "http://ex.com/a?a=1&b=2"
    assert canonicalize_url("https://Host.Local:443/x") == "https://host.local/x"
    assert canonicalize_url("https://h.l:8443/x") == "https://h.l:8443/x"
    assert canonicalize_url("http://h.l") == "http://h.l/"
    assert canonicalize_url("relative/path.html") == "relative/path.html"


def test_column_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = [r["c"] for r in df.select(canonicalize_url_col(F.col("url")).alias("c")).collect()]
    want = [canonicalize_url(u) for u in CASES]
    assert got == want


def test_host_parity(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = [r["h"] for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    want = [host_of_py(u) for u in CASES]
    assert got == want
