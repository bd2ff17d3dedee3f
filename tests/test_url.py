"""URL/host analytics goldens (text/url.py)."""

import pytest
from pyspark.sql import functions as F

from pygeoops_spark.text.url import (
    host_balanced_sample,
    host_stats,
    url_host,
    url_normalize,
    url_path,
    url_path_depth,
)


CASES = [
    # (url, host, path, depth)
    ("https://site1.example/p/42", "site1.example", "/p/42", 2),
    ("http://Site2.EXAMPLE:8080/a/b/c?q=1", "site2.example", "/a/b/c", 3),
    ("https://user@site3.example/x#frag", "site3.example", "/x", 1),
    ("https://site4.example", "site4.example", "", 0),
    ("https://site5.example/", "site5.example", "/", 0),
    ("http://USER@Site6.Example:80/A/?query=2#f", "site6.example", "/A/", 1),
]


def test_url_parts(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], ["url"])
    rows = df.select(
        "url",
        url_host("url").alias("h"),
        url_path("url").alias("p"),
        url_path_depth("url").alias("d"),
    ).collect()
    exp = {u: (h, p, d) for u, h, p, d in CASES}
    for r in rows:
        assert (r["h"], r["p"], r["d"]) == exp[r["url"]], r["url"]


def test_url_normalize(spark):
    df = spark.createDataFrame(
        [
            ("HTTPS://User@Site.Example:443/a/b?q=1#frag",),
            ("https://site.example/",),
        ],
        ["url"],
    )
    got = [r[0] for r in df.select(url_normalize("url")).collect()]
    assert got[0] == "https://site.example/a/b?q=1"
    assert got[1] == "https://site.example"


def test_host_stats_and_sample(spark):
    rows = []
    for i in range(40):
        host = f"h{i % 4}.example"
        rows.append((f"https://{host}/p/{i}", f"text {i % 10}"))
    df = spark.createDataFrame(rows, ["url", "text"])
    st = {r["host"]: r for r in host_stats(df).collect()}
    assert set(st) == {f"h{j}.example" for j in range(4)}
    for j in range(4):
        r = st[f"h{j}.example"]
        assert r["n_pages"] == 10
        # texts cycle i%10 and i%4 together: lcm 20 -> each host sees
        # 10 distinct texts? i = j, j+4, ..., j+36 -> i%10 takes 10/2=5
        assert r["n_distinct_text"] == 5
        assert r["dup_rate"] == pytest.approx(0.5)
        assert r["max_path_depth"] == 2
    samp = host_balanced_sample(df, 3)
    counts = (
        samp.groupBy(url_host("url").alias("h")).count().collect()
    )
    assert all(r["count"] == 3 for r in counts)
    # deterministic across reruns
    a = sorted(r["url"] for r in samp.collect())
    b = sorted(r["url"] for r in host_balanced_sample(df, 3).collect())
    assert a == b


MESSY_CASES = [
    # first-'//' anchoring: absolute URL embedded in a redirect param
    ("https://a.com/r?u=https://b.com", "a.com", "/r", 1),
    # '//' inside the path (empty segment filtered from depth)
    ("https://a.com/r//go?u=https://b.com/x", "a.com", "/r//go", 2),
    # protocol-relative URL in the query of a path-less url
    ("https://h?q=//evil.example/x", "h", "", 0),
    # bare host + fragment only
    ("https://h#frag", "h", "", 0),
    # scheme-less input: treated as authority-first
    ("example.com/a/b", "example.com", "/a/b", 2),
]


def test_url_parts_messy(spark):
    df = spark.createDataFrame([(u,) for u, *_ in MESSY_CASES], ["url"])
    rows = df.select(
        "url",
        url_host("url").alias("h"),
        url_path("url").alias("p"),
        url_path_depth("url").alias("d"),
    ).collect()
    exp = {u: (h, p, d) for u, h, p, d in MESSY_CASES}
    for r in rows:
        assert (r["h"], r["p"], r["d"]) == exp[r["url"]], r["url"]


def test_url_normalize_ports_and_guards(spark):
    cases = [
        # default ports stripped, matched to the scheme
        ("HTTP://Site.Example:80/a", "http://site.example/a"),
        ("HTTPS://Site.Example:443/a", "https://site.example/a"),
        # non-default port KEPT (it changes URL identity)
        ("https://site.example:8080/a", "https://site.example:8080/a"),
        # http on 443 is not a default pairing -> kept
        ("http://site.example:443/a", "http://site.example:443/a"),
        # no '//' -> unchanged
        ("example.com/a", "example.com/a"),
        # embedded URL in query survives normalization untouched
        (
            "HTTPS://A.com/r?u=https://b.com#frag",
            "https://a.com/r?u=https://b.com",
        ),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {r["url"]: r["n"] for r in df.select("url", url_normalize("url").alias("n")).collect()}
    for u, want in cases:
        assert got[u] == want, u
