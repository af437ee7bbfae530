"""SRE / traffic-analytics operators over parsed access-log fields.

The reference (nekrassov01/access-log-parser) stops at structured
parsing — parser.go emits the labeled fields, handler.go serializes
them. These operators are the reporting layer an operations team runs
NEXT on those fields: latency percentiles and Apdex per endpoint,
statistically-sound error-rate flags (Wilson bounds), multi-window SLO
burn-rate alerts, CDN cache-efficiency reports, availability-gap
detection, session transition matrices, retention cohorts, rendezvous
(HRW) shard routing for fanning the parsed stream out to downstream
consumers, GDPR IP anonymization with a measured k-anonymity check,
rolling active-user (DAU/WAU) growth metrics, and before/after latency
regression reports.

Scale notes (100 TB): every operator here reduces to at most two keyed
hash aggregates with map-side partial combine; none retains per-row
state past the first aggregate except ``latency_percentiles`` in exact
mode (per-group value list inside ObjectHashAggregate), which is why
the ``exact=False`` path switches to ``approx_percentile`` — a
bounded, MERGEABLE sketch that combines map-side and never ships raw
values.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _p_name(p: float) -> str:
    """0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9."""
    s = ("%g" % (p * 100)).replace(".", "_")
    return f"p{s}"


def latency_percentiles(
    df: DataFrame,
    key_col: str,
    latency_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-key latency percentiles: (key, p50, p90, p99, n).

    ``exact=True`` uses ``percentile`` (linear interpolation between
    closest ranks — the same definition DuckDB's ``quantile_cont``
    implements, which is what the oracle pins). Exact percentile holds
    the group's values in the aggregation buffer, so for the
    10^12-row design point pass ``exact=False``: ``approx_percentile``
    (a KLL-family sketch) has bounded state, combines map-side, and
    merges associatively — the plan stays ONE exchange on the key with
    partial aggregation either way.
    """
    arr = "array(" + ", ".join(repr(float(p)) for p in ps) + ")"
    fn = (
        f"percentile({latency_col}, {arr})"
        if exact
        else f"approx_percentile({latency_col}, {arr}, {accuracy})"
    )
    agg = df.groupBy(key_col).agg(
        F.expr(fn).alias("_ps"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cols = [F.col(key_col)] + [
        F.round(F.col("_ps")[i], 6).alias(_p_name(p)) for i, p in enumerate(ps)
    ]
    return agg.select(*cols, "n")


def apdex(
    df: DataFrame, key_col: str, latency_col: str, t: float
) -> DataFrame:
    """Apdex (Application Performance Index) per key.

    satisfied = latency <= T, tolerating = T < latency <= 4T,
    frustrated = rest; score = (satisfied + tolerating/2) / n.
    ONE hash aggregate — the three classes are conditional counts, so
    the whole operator combines map-side.
    """
    lat = F.col(latency_col)
    sat = F.sum(F.when(lat <= t, 1).otherwise(0)).cast("long")
    tol = F.sum(F.when((lat > t) & (lat <= 4 * t), 1).otherwise(0)).cast("long")
    return (
        df.groupBy(key_col)
        .agg(
            sat.alias("satisfied"),
            tol.alias("tolerating"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            key_col,
            "satisfied",
            "tolerating",
            (F.col("n") - F.col("satisfied") - F.col("tolerating")).alias(
                "frustrated"
            ),
            "n",
            F.round(
                (
                    F.col("satisfied").cast("double")
                    + F.col("tolerating").cast("double") / 2.0
                )
                / F.col("n").cast("double"),
                6,
            ).alias("apdex"),
        )
    )


def error_rate_wilson(
    df: DataFrame,
    key_col: str,
    error_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Per-key error rate with the Wilson score interval.

    A raw rate over 3 requests is noise; the Wilson interval (Wilson
    1927) gives the bound an alert should fire on: flag a key only
    when the LOWER bound clears the threshold, so low-traffic keys
    need proportionally stronger evidence. ``error_col`` is a 0/1 (or
    boolean) column. Output: (key, n, errors, rate, wilson_low,
    wilson_high) — all from ONE hash aggregate; the interval is
    closed-form arithmetic on the two counts.
    """
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(error_col).cast("int")).cast("long").alias("errors"),
    )
    n = F.col("n").cast("double")
    p = F.col("errors").cast("double") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    rad = z * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    return agg.select(
        key_col,
        "n",
        "errors",
        F.round(p, 6).alias("rate"),
        F.round(F.greatest(F.lit(0.0), (center - rad) / denom), 6).alias(
            "wilson_low"
        ),
        F.round(F.least(F.lit(1.0), (center + rad) / denom), 6).alias(
            "wilson_high"
        ),
    )


def slo_burn(
    df: DataFrame,
    ts_col: str,
    error_col: str,
    slo: float = 0.99,
    fast_hours: int = 6,
    slow_hours: int = 24,
    fast_threshold: float = 2.0,
    slow_threshold: float = 1.0,
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    pattern): burn = error_rate / error_budget, budget = 1 - slo; an
    alert needs BOTH the fast window (catches the spike) and the
    enclosing slow window (proves it is sustained) over threshold.

    ``slow_hours`` must be a multiple of ``fast_hours``. Plan: ONE
    bucket-keyed aggregate over the raw stream produces the fast
    table (rows = time span / fast window — tiny); the slow table is a
    RE-AGGREGATE of that fast table, never a second scan of the raw
    input, and joins back broadcast. Output one row per fast bucket:
    (bucket, n, errors, fast_burn, slow_burn, alert).
    """
    if slow_hours % fast_hours:
        raise ValueError("slow_hours must be a multiple of fast_hours")
    budget = 1.0 - slo
    fast_s = fast_hours * 3600
    slow_s = slow_hours * 3600
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / fast_s).cast("long") * fast_s
    )
    fast = (
        df.select(bucket.alias("bucket"), F.col(error_col).cast("int").alias("e"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("e").cast("long").alias("errors"),
        )
    )
    slow_key = F.timestamp_seconds(
        (F.unix_timestamp(F.col("bucket")) / slow_s).cast("long") * slow_s
    )
    slow = (
        fast.groupBy(slow_key.alias("slow_bucket"))
        .agg(
            F.sum("n").alias("sn"),
            F.sum("errors").alias("se"),
        )
        .select(
            "slow_bucket",
            (F.col("se").cast("double") / F.col("sn").cast("double") / budget).alias(
                "_slow_burn"
            ),
        )
    )
    fast_burn = F.col("errors").cast("double") / F.col("n").cast("double") / budget
    return (
        fast.join(
            F.broadcast(slow),
            slow_key.alias("k") == F.col("slow_bucket"),
        )
        .select(
            "bucket",
            "n",
            "errors",
            F.round(fast_burn, 6).alias("fast_burn"),
            F.round(F.col("_slow_burn"), 6).alias("slow_burn"),
            (
                (fast_burn > fast_threshold)
                & (F.col("_slow_burn") > slow_threshold)
            ).alias("alert"),
        )
    )


def cache_report(
    df: DataFrame, key_col: str, result_col: str, bytes_col: str
) -> DataFrame:
    """CDN cache-efficiency report over CloudFront-style result types.

    ``Hit`` and ``RefreshHit`` count as served-from-cache (RefreshHit
    revalidated at the origin but still served the cached body).
    Output per key: (key, requests, hits, hit_ratio, bytes_total,
    bytes_from_cache) — ONE hash aggregate, conditional sums.
    """
    cached = F.col(result_col).isin("Hit", "RefreshHit")
    b = F.col(bytes_col).cast("long")
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("requests"),
            F.sum(cached.cast("int")).cast("long").alias("hits"),
            F.sum(b).alias("bytes_total"),
            F.sum(F.when(cached, b).otherwise(F.lit(0))).alias(
                "bytes_from_cache"
            ),
        )
        .select(
            key_col,
            "requests",
            "hits",
            F.round(
                F.col("hits").cast("double") / F.col("requests").cast("double"), 6
            ).alias("hit_ratio"),
            "bytes_total",
            "bytes_from_cache",
        )
    )


def session_transitions(
    df: DataFrame, user_col: str, ts_col: str, page_col: str
) -> DataFrame:
    """First-order Markov transition counts between pages.

    lag() per user over event time pairs each request with its
    predecessor; the (prev, page) pair counts are the transition
    matrix search/UX teams read. Tie-break on the page column makes
    the order total when two events share a timestamp. Plan: one
    exchange on the user key for the window, then one (prev, page)
    hash aggregate with map-side combine — the pair space is tiny
    next to the traffic, so partials collapse per map task.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, page_col)
    return (
        df.select(
            F.col(user_col),
            F.lag(F.col(page_col)).over(w).alias("prev_page"),
            F.col(page_col).alias("page"),
        )
        .filter(F.col("prev_page").isNotNull())
        .groupBy("prev_page", "page")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def gap_windows(
    df: DataFrame, key_col: str, ts_col: str, min_gap_s: int
) -> DataFrame:
    """Availability gaps: per key, spans between consecutive events
    longer than ``min_gap_s`` seconds — the log-side signal for "the
    source went quiet" (crashed emitter, stuck shipper, downtime).

    Output: (key, gap_start, gap_end, gap_s). ONE exchange on the key
    for the lag window; the filter drops everything but the gaps
    before anything else moves.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
    return (
        df.select(
            F.col(key_col),
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            gap.alias("gap_s"),
        )
        .filter(F.col("gap_start").isNotNull() & (F.col("gap_s") >= min_gap_s))
    )


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Day-grain retention cohorts: users grouped by first-seen day,
    counted on each later active day as an offset from their cohort.

    Plan: distinct (user, day) activity first (one user-keyed
    aggregate — this is the only pass over the raw input), cohort =
    min(day) per user re-aggregated from THAT table, joined back on
    the user key (same partitioning, no extra exchange under AQE),
    then one (cohort, offset) count. Output: (cohort_day, day_offset,
    n_users).
    """
    day = F.date_trunc("day", F.col(ts_col))
    activity = (
        df.select(F.col(user_col).alias("u"), day.alias("day")).distinct()
    )
    cohort = activity.groupBy("u").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "u")
        .select(
            "cohort_day",
            (F.datediff(F.col("day"), F.col("cohort_day"))).cast("long").alias(
                "day_offset"
            ),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def rendezvous_shards(
    df: DataFrame, key_col: str, n_shards: int
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard routing + the stability
    report that justifies it.

    Each key hashes once per shard (md5 of ``key:shard``) and routes
    to the argmax — the HRW property (Thaler & Ravishankar 1998) is
    that REMOVING a shard only moves the keys that were on it, unlike
    mod-N where nearly everything moves. Output per shard:
    (shard, n_keys, n_moved_on_remove_last) where the moved column
    counts this shard's keys whose assignment changes when shard
    n-1 is dropped — exactly n_keys for the dropped shard, 0
    elsewhere, and the report proves it from the data rather than
    asserting it.

    Plan: the weight array is a per-row expression (n_shards md5
    calls, constant); ONE shard-keyed hash aggregate follows. The hex
    digests compare lexicographically, so no int conversion is
    needed and the oracle replays the same comparison.
    """
    key = F.col(key_col).cast("string")

    def weights(n: int) -> Column:
        return F.array(
            *[F.md5(F.concat(key, F.lit(f":{s}"))) for s in range(n)]
        )

    def argmax(n: int) -> Column:
        arr = weights(n)
        return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")

    shard_n = argmax(n_shards)
    shard_n1 = argmax(n_shards - 1)
    return (
        df.select(
            shard_n.alias("shard"),
            (shard_n != shard_n1).cast("int").alias("_moved"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("_moved").cast("long").alias("n_moved_on_remove_last"),
        )
    )


def ip_anonymize_report(
    df: DataFrame, ip_col: str, k_threshold: int = 5
) -> DataFrame:
    """GDPR-style IPv4 anonymization with a measured k-anonymity check.

    Masking to the /24 prefix (zeroed last octet) is the standard
    log-retention move; whether it actually anonymizes depends on how
    many distinct source IPs share each prefix — a prefix carrying ONE
    client re-identifies it. Output per prefix: (prefix24, n_requests,
    k_distinct_ips, k_ok) where k_ok = k >= ``k_threshold``.

    Plan at 100 TB: the mask is a pure regexp projection; the report is
    ONE prefix-keyed aggregate (count + exact distinct over the <=256
    possible tails per prefix — bounded, so count_distinct's per-group
    state cannot blow up the way a raw-cardinality key would).
    """
    prefix = F.regexp_replace(F.col(ip_col), r"\.\d+$", ".0")
    return (
        df.select(prefix.alias("prefix24"), F.col(ip_col).alias("_ip"))
        .groupBy("prefix24")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_requests"),
            F.count_distinct(F.col("_ip")).cast("long").alias("k_distinct_ips"),
        )
        .select(
            "prefix24",
            "n_requests",
            "k_distinct_ips",
            (F.col("k_distinct_ips") >= k_threshold).alias("k_ok"),
        )
    )


def active_users_rolling(
    df: DataFrame, user_col: str, ts_col: str, window_days: int = 7
) -> DataFrame:
    """DAU / rolling-WAU / stickiness per active day.

    The rolling distinct-user count cannot be re-aggregated from daily
    distincts (users overlap across days), so each distinct
    (user, day) activity row is fanned out to the ``window_days``
    window-end days it falls inside, then deduplicated per (user,
    window-end) — two bounded exchanges instead of a per-day
    re-scan-the-week self-join. Trailing windows past the last active
    day are not reported (output rows = days with any activity);
    leading windows are partial by construction, as in any WAU chart.

    Output: (day, dau, wau, stickiness = dau/wau).
    """
    day = F.date_trunc("day", F.col(ts_col))
    activity = df.select(F.col(user_col).alias("u"), day.alias("day")).distinct()
    dau = activity.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    fan = activity.select(
        "u",
        F.explode(
            F.array(*[
                F.col("day") + F.expr(f"INTERVAL {i} DAY")
                for i in range(window_days)
            ])
        ).alias("wd"),
    ).distinct()
    wau = fan.groupBy("wd").agg(F.count(F.lit(1)).cast("long").alias("wau"))
    return (
        dau.join(wau, dau["day"] == wau["wd"])
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


def latency_regression(
    df: DataFrame,
    key_col: str,
    latency_col: str,
    ts_col: str,
    split_ts,
    p: float = 0.95,
    threshold: float = 0.1,
) -> DataFrame:
    """Week-over-week style latency regression report: per key, the
    exact p-quantile latency before vs after ``split_ts``, the delta,
    and a regressed flag at ``threshold`` seconds.

    Plan: ONE (key, period) aggregate over the raw input, then a
    key-keyed self-join of the two tiny period tables (broadcast).
    Keys seen in only one period drop — there is nothing to compare.
    """
    period = F.when(F.col(ts_col) < F.lit(split_ts), F.lit("before")).otherwise(
        F.lit("after")
    )
    agg = (
        df.select(
            F.col(key_col).alias("k"), period.alias("period"),
            F.col(latency_col).alias("lat"),
        )
        .groupBy("k", "period")
        .agg(
            F.expr(f"percentile(lat, {p!r})").alias("pq"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    before = agg.filter(F.col("period") == "before").select(
        F.col("k"), F.col("pq").alias("_pb"), F.col("n").alias("n_before")
    )
    after = agg.filter(F.col("period") == "after").select(
        F.col("k"), F.col("pq").alias("_pa"), F.col("n").alias("n_after")
    )
    return (
        before.join(F.broadcast(after), "k")
        .select(
            F.col("k").alias(key_col),
            F.round(F.col("_pb"), 6).alias("p_before"),
            F.round(F.col("_pa"), 6).alias("p_after"),
            F.round(F.col("_pa") - F.col("_pb"), 6).alias("delta"),
            "n_before",
            "n_after",
            ((F.col("_pa") - F.col("_pb")) > threshold).alias("regressed"),
        )
    )
