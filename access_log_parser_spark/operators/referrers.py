"""Search-referrer analytics over parsed access-log fields — the other
classic consumer of the reference's parse surface next to
:mod:`botdetect`: the Referer column of CLF/combined logs
(parser_regex.go's presets all capture it) tells a site which search
engine sent each visitor and what they searched for, and "top search
terms driving traffic" is the canonical log-analytics report built on
it.

Grammar subset (pinned so the DuckDB oracle replays it exactly):

- engine = first match in a fixed host-substring list over the
  referer's authority (google / bing / duckduckgo / yandex / baidu,
  else a generic ``?q=``/``?query=`` carrier classifies as 'other');
  non-search referers and the CLF empty marker ``-`` yield no row.
- term = the first ``q`` or ``query`` parameter value, with ``+``
  decoded to space and lowercased. Full percent-decoding is NOT
  performed (pinned: the common engines plus-encode spaces; %-escapes
  pass through verbatim so the report never mangles multibyte terms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REFERER_HOST_RE = r"^https?://([^/?#]+)"
SEARCH_PARAM_RE = r"[?&](?:q|query)=([^&#]*)"

_ENGINES = [
    ("google", "google"),
    ("bing", "bing"),
    ("duckduckgo", "duckduckgo"),
    ("yandex", "yandex"),
    ("baidu", "baidu"),
]


def _engine_col(host: Column, term_raw: Column) -> Column:
    expr = None
    for sub, name in _ENGINES:
        branch = F.when(host.contains(sub), F.lit(name))
        expr = branch if expr is None else expr.when(
            host.contains(sub), F.lit(name)
        )
    return expr.otherwise(
        F.when(term_raw != "", F.lit("other"))
    )


def search_referrers(
    df: DataFrame, referer_col: str = "referer"
) -> DataFrame:
    """Per-(engine, term) search-traffic counts from the Referer field.

    Returns (engine, term, hits) for rows whose referer is a search
    engine carrying a non-empty ``q``/``query`` parameter; everything
    else (direct '-', internal navigation, non-search sites) drops.

    Plan at 100 TB: the extraction is a pure projection (two RE2-safe
    regexp_extracts + replace/lower) and the report ONE (engine, term)
    keyed count with map-side combine — term space is heavy-tailed but
    the partial agg collapses hot terms map-side."""
    ref = F.coalesce(F.col(referer_col), F.lit(""))
    host = F.lower(F.regexp_extract(ref, REFERER_HOST_RE, 1))
    term_raw = F.regexp_extract(ref, SEARCH_PARAM_RE, 1)
    term = F.nullif(
        F.lower(F.replace(term_raw, F.lit("+"), F.lit(" "))), F.lit("")
    )
    engine = _engine_col(host, term_raw)
    return (
        df.select(engine.alias("engine"), term.alias("term"))
        .filter(F.col("engine").isNotNull() & F.col("term").isNotNull())
        .groupBy("engine", "term")
        .agg(F.count(F.lit(1)).alias("hits"))
    )


UTM_RES = {
    "utm_source": r"[?&]utm_source=([^&#]*)",
    "utm_medium": r"[?&]utm_medium=([^&#]*)",
    "utm_campaign": r"[?&]utm_campaign=([^&#]*)",
}


def utm_attribution(df: DataFrame, uri_col: str = "request_uri") -> DataFrame:
    """Campaign attribution from the request URI's utm_* parameters —
    the marketing-side twin of :func:`search_referrers`, read from the
    landing URL instead of the Referer.

    Grammar subset (oracle-replayable): each parameter is the first
    ``utm_source`` / ``utm_medium`` / ``utm_campaign`` occurrence in
    the query string, lowercased, ``+`` decoded to space; an absent or
    empty parameter reports as ``-`` (the CLF empty marker). Rows with
    none of the three parameters drop — they are untagged traffic, not
    an attribution row.

    Output: (utm_source, utm_medium, utm_campaign, hits). Plan: a pure
    regexp projection into ONE triple-keyed count with map-side
    combine.
    """
    uri = F.coalesce(F.col(uri_col), F.lit(""))

    def param(pattern: str) -> Column:
        raw = F.regexp_extract(uri, pattern, 1)
        return F.when(
            raw == "", F.lit("-")
        ).otherwise(F.lower(F.replace(raw, F.lit("+"), F.lit(" "))))

    cols = {name: param(p) for name, p in UTM_RES.items()}
    tagged = None
    for c in cols.values():
        t = (c != "-").cast("int")
        tagged = t if tagged is None else tagged + t
    return (
        df.select(
            *[c.alias(name) for name, c in cols.items()],
            tagged.alias("_tagged"),
        )
        .filter(F.col("_tagged") > 0)
        .groupBy("utm_source", "utm_medium", "utm_campaign")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )


def last_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    campaign_col: str,
    conversion_col: str,
) -> DataFrame:
    """Last-touch conversion attribution: each conversion credits the
    most recent campaign-tagged touch at or before it in the user's
    event stream (``campaign_col`` NULL on untagged rows); conversions
    with no preceding touch report campaign ``-`` (organic).

    Output: (campaign, conversions). Plan at 100 TB: ONE user-keyed
    exchange for the last_value(ignorenulls) window ordered
    (ts, campaign) — tie-total like session_transitions — then one
    campaign-keyed count over the conversions only.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(campaign_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col(campaign_col), ignorenulls=True).over(w)
    return (
        df.select(
            F.col(conversion_col).alias("_conv"),
            F.coalesce(carried, F.lit("-")).alias("campaign"),
        )
        .filter(F.col("_conv"))
        .groupBy("campaign")
        .agg(F.count(F.lit(1)).cast("long").alias("conversions"))
    )
