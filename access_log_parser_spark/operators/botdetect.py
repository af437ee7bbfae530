"""Bot/crawler detection over parsed access-log fields — the classic
consumer of the reference's parse surface (parser_regex.go's presets
exist to feed exactly this kind of per-client analytics): once lines are
decoded to (remote_host, request_uri, status, user_agent), a traffic
pipeline separates automated clients from humans before computing
engagement or abuse metrics.

Three standard signals, each cheap and engine-replayable:

- **UA self-identification**: any request whose User-Agent matches the
  well-known bot token list (case-insensitive substring class — honest
  crawlers announce themselves per the robots.txt social contract).
- **URI diversity**: bots walk many distinct URIs, humans revisit;
  diversity = distinct URIs / requests, gated above ``min_requests`` so
  tiny samples don't fire.
- **Error appetite**: clients probing for endpoints rack up 4xx/5xx;
  err_ratio = responses with status >= 400 / requests.

``bot_score`` counts fired signals (0-3); ``is_bot`` = score >= 2 (two
independent signals — the single-signal tiers stay visible for
threshold tuning downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOT_UA_RE = (
    r"(?i)(bot|crawl|spider|slurp|curl|wget|python-requests|headless)"
)


def bot_signals(
    df: DataFrame,
    host_col: str = "remote_host",
    uri_col: str = "request_uri",
    status_col: str = "status",
    ua_col: str = "user_agent",
    min_requests: int = 10,
    diversity_threshold: float = 0.8,
    error_threshold: float = 0.5,
) -> DataFrame:
    """Per-client bot signals over parsed log fields.

    Returns (host, n_req, n_uris, uri_diversity, err_ratio, ua_bot,
    bot_score, is_bot); ratios rounded to 6 dp in the OUTPUT only —
    the threshold comparisons run on the exact count arithmetic so the
    DuckDB oracle replays flags without float-rounding edge cases.
    ``status`` may arrive as the parse surface's string column; it is
    cast for the >= 400 test (non-numeric -> NULL -> not an error).

    Plan at 100 TB: ONE host-keyed aggregate — counts and the UA flag
    are map-side-combinable partials; the exact distinct-URI count
    rewrites to Spark's two-phase expand+agg on the same key; the
    flag/score projection is pure codegen after the agg. Skewed clients
    (one IP = half the traffic) are exactly the AQE skew-agg case the
    session config enables."""
    # try_cast, not cast: ANSI mode throws on malformed numerics, and
    # the contract is non-numeric status -> NULL -> not an error
    status_num = F.col(status_col).try_cast("int")
    agg = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_req"),
        F.countDistinct(F.col(uri_col)).alias("n_uris"),
        F.max(
            F.when(F.col(ua_col).rlike(BOT_UA_RE), 1).otherwise(0)
        ).alias("_ua_bot"),
        F.sum(
            F.when(status_num >= 400, 1).otherwise(0)
        ).alias("_errs"),
    )
    diverse = (F.col("n_req") >= min_requests) & (
        F.col("n_uris") >= F.lit(diversity_threshold) * F.col("n_req")
    )
    err_heavy = F.col("_errs") >= F.lit(error_threshold) * F.col("n_req")
    score = (
        F.col("_ua_bot")
        + F.when(diverse, 1).otherwise(0)
        + F.when(err_heavy, 1).otherwise(0)
    )
    return agg.select(
        "host",
        "n_req",
        "n_uris",
        F.round(F.col("n_uris") / F.col("n_req"), 6).alias("uri_diversity"),
        F.round(F.col("_errs") / F.col("n_req"), 6).alias("err_ratio"),
        (F.col("_ua_bot") == 1).alias("ua_bot"),
        score.cast("int").alias("bot_score"),
        (score >= 2).alias("is_bot"),
    )
