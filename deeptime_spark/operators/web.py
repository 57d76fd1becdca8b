"""Web/crawl-layer operators: URL normalization, host extraction,
blocklist filtering, and HTML-to-text boilerplate stripping.

The stage BEFORE every document pipeline: a crawl emits (url, html)
pairs, and fetch-level dedup / domain accounting / boilerplate removal
happen here, long before tokenization. Reference analytics engines stop
at the tabular layer; a training-data pipeline cannot (CCNet, C4, and
RefinedWeb all begin with URL canonicalization + WET-style text
extraction), so this module treats both as first-class relational
operators.

Every transformation is a chain of JVM codegen string/regex expressions
— no Python in the hot path, no shuffle (pure projection), and the
regexes are deliberately restricted to the RE2-compatible subset (no
backreferences, no lookaround) so an independent SQL engine can replay
the normalization verbatim as an oracle. At 100 TB this stage is
scan-bound: it fuses into the parquet scan under whole-stage codegen
and never materializes the raw HTML past the projection.

URL canonicalization follows RFC 3986 §6 conservative normalization
(lowercase scheme+host, drop default ports, drop fragments) plus the
tracking-parameter strip every production crawl pipeline applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that identify a click, not a resource — stripping
# them is what makes fetch-level URL dedup actually deduplicate.
TRACKING_PARAMS = r"(?:utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)"

# scheme://authority — the case-insensitive part of a URL (RFC 3986 §6.2.2.1)
_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(url: str | Column) -> Column:
    """Lowercased scheme, '' when the URL has none."""
    return F.lower(F.regexp_extract(_col(url), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def url_host(url: str | Column) -> Column:
    """Lowercased host (authority minus userinfo/port), '' when absent."""
    auth = F.regexp_extract(_col(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":[0-9]*$", ""))


def registered_domain(host: str | Column) -> Column:
    """Last two dot-labels of a host — the eTLD+1 heuristic used for
    domain-level accounting when no public-suffix list is shipped
    ('news.bbc.co.uk' -> 'co.uk' caveat documented; exact PSL lookup is
    a broadcast-join against a suffix table, same plan shape)."""
    return F.regexp_extract(_col(host), r"([^.]+\.[^.]+)$", 1)


def normalize_url(url: str | Column) -> Column:
    """Conservative URL canonicalization as one codegen expression chain:

    1. trim; lowercase scheme://host (path/query case is preserved —
       paths are case-sensitive per RFC 3986);
    2. drop the fragment ('#...' never reaches the server);
    3. drop default ports (':80' for http, ':443' for https);
    4. strip tracking query parameters (TRACKING_PARAMS);
    5. clean separator debris ('?&' -> '?', trailing '?'/'&');
    6. collapse duplicate slashes in the path (not the scheme's '//').

    RE2-safe (no lookaround/backrefs) so a SQL oracle replays it.
    """
    u = F.trim(_col(url))
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    rest = F.substring(u, F.length(prefix) + F.lit(1), F.length(u))
    lowered = F.lower(prefix)
    # default ports: only for the scheme they are default FOR
    lowered = F.when(
        lowered.startswith("http://"), F.regexp_replace(lowered, r":80$", "")
    ).when(
        lowered.startswith("https://"), F.regexp_replace(lowered, r":443$", "")
    ).otherwise(lowered)
    rest = F.regexp_replace(rest, r"#.*$", "")
    # Anchored at a separator and matching RUNS of consecutive tracking
    # params, so 'ref=' never matches inside a longer name ('href=') and
    # adjacent tracking params vanish in one pass.
    rest = F.regexp_replace(
        rest, r"([?&])(?:" + TRACKING_PARAMS + r"=[^&#]*&)+", r"$1"
    )
    rest = F.regexp_replace(
        rest,
        r"[?&](?:" + TRACKING_PARAMS + r"=[^&#]*&)*" + TRACKING_PARAMS + r"=[^&#]*$",
        "",
    )
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    # collapse '//' in the PATH only — query strings may legally carry '//'
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.substring(rest, F.length(path) + F.lit(1), F.length(rest))
    rest = F.concat(F.regexp_replace(path, r"//+", "/"), query)
    return F.concat(lowered, rest)


def filter_blocked_hosts(
    df: DataFrame, blocked: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose normalized host is on a blocklist. Small lists
    ride an isin() literal predicate (pure scan filter); big lists should
    come as a DataFrame and use an anti-join — see
    ``filter_blocked_hosts_df``."""
    return df.where(~url_host(F.col(url_col)).isin([h.lower() for h in blocked]))


def filter_blocked_hosts_df(
    df: DataFrame, blocked: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """Blocklist as a table: LEFT ANTI join on host. The blocklist is the
    small side — broadcast it so the corpus never shuffles."""
    probe = df.withColumn("_host", url_host(F.col(url_col)))
    b = blocked.select(F.lower(F.col(host_col)).alias("_bhost")).distinct()
    return (
        probe.join(F.broadcast(b), probe["_host"] == b["_bhost"], "left_anti")
        .drop("_host")
    )


def url_dedup_key(url: str | Column) -> Column:
    """Canonical fetch-identity key: normalized URL. groupBy(this) +
    min(struct(...)) is exact fetch-level dedup with first-occurrence
    winners — same map-side-partial-agg shape as
    ``dedup.drop_duplicate_lines_across_docs``."""
    return normalize_url(url)


def host_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-host corpus accounting: page count, token mass, distinct
    normalized URLs. One hash aggregation; host extraction fuses into
    the scan."""
    from deeptime_spark.operators.text import token_count

    return (
        df.select(
            url_host(F.col(url_col)).alias("host"),
            normalize_url(F.col(url_col)).alias("_nurl"),
            token_count(text_col).alias("_tok"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("_tok").alias("n_tokens"),
            F.countDistinct("_nurl").alias("n_urls"),
        )
    )


# ---------------------------------------------------------------------------
# HTML -> text (WET-style extraction)
# ---------------------------------------------------------------------------

# Entity subset every extractor handles without an entity table. Order
# matters: &amp; LAST so '&amp;lt;' decodes to '&lt;' (single pass), not '<'.
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def html_title(html: str | Column) -> Column:
    """<title> content, whitespace-collapsed, '' when absent."""
    t = F.regexp_extract(_col(html), r"(?is)<title[^>]*>([^<]*)", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_to_text(html: str | Column) -> Column:
    """Boilerplate-stripping HTML->text as a codegen regex chain (the
    WET-extraction stage of a crawl pipeline):

    1. drop <script>/<style> elements INCLUDING their content;
    2. drop comments and DOCTYPE/processing instructions;
    3. block-level closing tags and <br> become newlines (so paragraph
       structure survives for the line-level C4 rules downstream);
    4. every remaining tag becomes a space;
    5. decode the six universal entities (&amp; last);
    6. collapse horizontal whitespace, trim line edges, collapse blank
       lines.

    Deliberately RE2-compatible: script/style are separate alternations
    (backreferences like </\\1> don't exist in RE2, so a SQL oracle can
    replay the chain). Non-HTML input passes through mostly unchanged —
    the chain only rewrites tag/entity syntax.
    """
    c = _col(html)
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<!doctype[^>]*>|<\?[^>]*\?>", " ")
    c = F.regexp_replace(
        c, r"(?i)<br\s*/?>|</(?:p|div|li|tr|h1|h2|h3|h4|h5|h6|title|blockquote)\s*>", "\n"
    )
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    return F.trim(c)


def extract_text_from_html(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Projection wrapper: adds extracted text + title, drops the raw
    HTML column so the wide payload never travels past the scan stage."""
    return df.select(
        *[c for c in df.columns if c != html_col],
        html_title(F.col(html_col)).alias("title"),
        html_to_text(F.col(html_col)).alias(out_col),
    )
