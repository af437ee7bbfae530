"""User-Agent structuring over the parsed ``user_agent`` capture — the
third classic consumer of the reference's parse surface next to
:mod:`botdetect` (per-client behavior) and :mod:`referrers` (traffic
source): every access-log report tool ships a browser/OS breakdown.

Grammar subset (pinned so the DuckDB oracle replays it exactly; full UA
parsing needs the uap-core rule corpus — this is the deliberately small,
deterministic family tier):

- family: first match wins, in this order —
  ``bot`` (Googlebot|bingbot|YandexBot|Baiduspider|DuckDuckBot|
  crawler|spider|curl|wget, case-insensitive), ``edge`` (``Edg/``),
  ``chrome`` (``Chrome/`` without Edg), ``safari`` (``Safari/`` without
  Chrome), ``firefox`` (``Firefox/``), else ``other``.
- os: first match — ``windows`` (``Windows NT``), ``ios``
  (iPhone|iPad), ``macos`` (``Mac OS X`` after the iOS test — iOS UAs
  also carry "like Mac OS X"), ``android``, ``linux``, else ``other``.
- major: the integer after the matched family token (absent for
  bot/other -> NULL).

The detection order IS the contract: Edge carries ``Chrome/`` and
Safari tokens, Chrome carries ``Safari/``, iOS carries ``Mac OS X`` —
each rule must run before the token it shadows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOT_RE = (
    r"(?i)(googlebot|bingbot|yandexbot|baiduspider|duckduckbot"
    r"|crawler|spider|curl|wget)"
)

_FAMILY_TOKEN = {"edge": "Edg", "chrome": "Chrome", "safari": "Safari",
                 "firefox": "Firefox"}


def ua_family_col(ua: Column) -> Column:
    return (
        F.when(ua.rlike(BOT_RE), F.lit("bot"))
        .when(ua.contains("Edg/"), F.lit("edge"))
        .when(ua.contains("Chrome/"), F.lit("chrome"))
        .when(ua.contains("Safari/"), F.lit("safari"))
        .when(ua.contains("Firefox/"), F.lit("firefox"))
        .otherwise(F.lit("other"))
    )


def ua_os_col(ua: Column) -> Column:
    return (
        F.when(ua.contains("Windows NT"), F.lit("windows"))
        .when(ua.rlike(r"iPhone|iPad"), F.lit("ios"))
        .when(ua.contains("Mac OS X"), F.lit("macos"))
        .when(ua.contains("Android"), F.lit("android"))
        .when(ua.contains("Linux"), F.lit("linux"))
        .otherwise(F.lit("other"))
    )


def ua_major_col(ua: Column, family: Column) -> Column:
    """Major version behind the matched family token; NULL when the
    family has no version token (bot/other)."""
    out = None
    for fam, token in _FAMILY_TOKEN.items():
        v = F.regexp_extract(ua, token + r"/(\d+)", 1)
        branch = F.when((family == fam) & (v != ""), v.cast("int"))
        out = branch if out is None else out.when(
            (family == fam) & (v != ""), v.cast("int")
        )
    return out.otherwise(F.lit(None).cast("int"))


def ua_breakdown(df: DataFrame, ua_col: str = "user_agent") -> DataFrame:
    """Per-(family, os, major) request counts — the browser/OS report.

    Plan at 100 TB: the classification is a pure first-match-wins
    projection (bounded contains/rlike chain, no UDF); the report is
    ONE triple-keyed count whose tiny key space collapses map-side.
    """
    ua = F.coalesce(F.col(ua_col), F.lit(""))
    fam = ua_family_col(ua)
    return (
        df.select(
            fam.alias("family"),
            ua_os_col(ua).alias("os"),
            ua_major_col(ua, fam).alias("major"),
        )
        .groupBy("family", "os", "major")
        .agg(F.count(F.lit(1)).cast("long").alias("requests"))
    )
