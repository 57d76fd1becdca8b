"""Unit pins for the web/crawl layer (operators/web.py).

The normalize_url chain is pure codegen regex; these tests pin the
RFC-3986-conservative semantics and the round-4 ADVICE regressions:
'ref=' must not match inside a longer parameter name ('href='), and
duplicate-slash collapse must not touch the query string.
"""

import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators import web


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["v"] for r in df.select(web.normalize_url("url").alias("v")).collect()]


NORMALIZE_CASES = [
    # scheme+host lowercase, default port drop, fragment drop, path case kept
    ("HTTP://ExAmple.COM:80/Path/To?q=1#frag", "http://example.com/Path/To?q=1"),
    ("https://Host.com:443//a//b?x=1", "https://host.com/a/b?x=1"),
    # non-default ports survive (and :80 is NOT default for https)
    ("http://h.com:8080/x", "http://h.com:8080/x"),
    ("https://h.com:80/x", "https://h.com:80/x"),
    # REGRESSION: 'ref' must not strip inside 'href'/'xref'
    ("http://h.com/p?href=a&b=c", "http://h.com/p?href=a&b=c"),
    ("http://h.com/p?xref=1&b=2", "http://h.com/p?xref=1&b=2"),
    ("http://h.com/p?a=1&xref=2", "http://h.com/p?a=1&xref=2"),
    # tracking params: middle, tail, whole-query, consecutive runs
    ("http://h.com/p?ref=abc", "http://h.com/p"),
    ("http://h.com/p?a=1&fbclid=xyz", "http://h.com/p?a=1"),
    ("http://h.com/p?utm_source=x&utm_medium=y&q=1", "http://h.com/p?q=1"),
    ("http://h.com/p?utm_a=1&gclid=2", "http://h.com/p"),
    ("http://h.com/p?utm_a=1&b=2&ref=3&x=4", "http://h.com/p?b=2&x=4"),
    # REGRESSION: '//' inside the query string is preserved
    ("http://h.com/p?a=//b//c", "http://h.com/p?a=//b//c"),
    ("http://h.com//p//q?next=http://e.com//x", "http://h.com/p/q?next=http://e.com//x"),
    # whitespace trim; schemeless input passes through the rest-chain only
    ("  http://h.com/x  ", "http://h.com/x"),
    ("no-scheme/path//x?ref=1", "no-scheme/path/x"),
]


@pytest.mark.parametrize("raw,want", NORMALIZE_CASES)
def test_normalize_url(spark, raw, want):
    assert _norm(spark, [raw]) == [want]


def test_url_host_and_scheme(spark):
    df = spark.createDataFrame(
        [("HTTPS://User:pw@Host.Example.COM:8443/a?b=1",), ("not a url",)],
        "url string",
    )
    rows = df.select(
        web.url_scheme("url").alias("s"), web.url_host("url").alias("h")
    ).collect()
    assert (rows[0]["s"], rows[0]["h"]) == ("https", "host.example.com")
    assert (rows[1]["s"], rows[1]["h"]) == ("", "")


def test_registered_domain_heuristic(spark):
    df = spark.createDataFrame(
        [("www.example.com",), ("news.bbc.co.uk",), ("localhost",)], "h string"
    )
    got = [r["d"] for r in df.select(web.registered_domain("h").alias("d")).collect()]
    # documented eTLD+1 heuristic: last two labels (co.uk caveat included)
    assert got == ["example.com", "co.uk", ""]


def test_blocklist_filters(spark):
    df = spark.createDataFrame(
        [(1, "http://Spam.com/a"), (2, "http://ok.com/b"), (3, "https://spam.com:443/c")],
        "id long, url string",
    )
    assert sorted(
        r["id"] for r in web.filter_blocked_hosts(df, ["SPAM.com"]).collect()
    ) == [2]
    blocked = spark.createDataFrame([("Spam.com",)], "host string")
    assert sorted(
        r["id"] for r in web.filter_blocked_hosts_df(df, blocked).collect()
    ) == [2]


def test_host_stats_counts_normalized_urls(spark):
    df = spark.createDataFrame(
        [
            ("http://A.com/x?utm_s=1", "one two"),
            ("http://a.com/x", "three"),
            ("http://a.com/y", "four five six"),
            ("http://b.com/", "seven"),
        ],
        "url string, text string",
    )
    rows = {r["host"]: r for r in web.host_stats(df).collect()}
    # the two a.com/x variants normalize to ONE distinct url
    assert rows["a.com"]["n_pages"] == 3
    assert rows["a.com"]["n_urls"] == 2
    assert rows["a.com"]["n_tokens"] == 6
    assert rows["b.com"]["n_pages"] == 1


def test_html_to_text_strips_boilerplate(spark):
    html = (
        "<html><head><title> My  Page </title>"
        "<style>p{color:red}</style><script>var x=1;</script></head>"
        "<body><!-- c --><p>Hello &amp; welcome</p><br><div>Second&nbsp;line</div>"
        "</body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    row = df.select(
        web.html_title("html").alias("t"), web.html_to_text("html").alias("x")
    ).collect()[0]
    assert row["t"] == "My Page"
    assert "var x=1" not in row["x"] and "color:red" not in row["x"]
    assert "Hello & welcome" in row["x"]
    assert "Second line" in row["x"]


def test_normalize_url_idempotent_on_generated_urls(spark):
    """Canonicalization must be IDEMPOTENT: normalize(normalize(u)) ==
    normalize(u) — the property that makes the normalized URL a stable
    dedup key. Property-tested over a generated cross-product of scheme
    case, ports, userinfo, path debris, tracking/normal params, and
    fragments (batched through one Spark job, not per-example sessions)."""
    schemes = ["http://", "HTTP://", "https://", "HtTpS://", ""]
    hosts = ["Example.com", "a.B.co", "user:pw@Host.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["/", "//a//b", "/Path/x", ""]
    params = [
        "", "?a=1", "?utm_source=x", "?ref=y&a=1", "?a=1&gclid=2",
        "?href=a&ref=b", "?utm_a=1&utm_b=2&q=3", "?a=//b//c",
    ]
    frags = ["", "#frag", "#a#b"]
    urls = [
        s + h + po + pa + q + f
        for s in schemes
        for h in hosts
        for po in ports
        for pa in paths
        for q in params
        for f in frags
    ]
    # one pass: v1 = normalize(url), v2 = normalize(v1)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    v1 = df.select(web.normalize_url("url").alias("u1"))
    rows = v1.select("u1", web.normalize_url("u1").alias("u2")).collect()
    bad = [(r["u1"], r["u2"]) for r in rows if r["u1"] != r["u2"]]
    assert not bad, f"{len(bad)} non-idempotent cases, first: {bad[:3]}"
