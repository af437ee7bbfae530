"""Distributed as-of (temporal nearest) join.

The classic log-pipeline enrichment Spark has no built-in operator for:
attach to each fact row the most recent dimension row *as of* the fact's
timestamp (config/deploy version active when a request hit, exchange
rate at trade time, ...). The reference has no joins at all (SURVEY.md
SS2.3); this generalizes the north_rule's lookup-enrich stage to
slowly-changing dimensions.

Spark-first plan — the union + running-window formulation, NOT a range
join: tag both sides, union them, and for every key run ONE window
ordered by (ts, side) carrying the last non-null dimension value forward
(or backward for ``direction='forward'``). Cost is a single hash
exchange on the key plus one sort — the same shape as any per-key
window — instead of the O(|facts| x |dim-rows-per-key|) expansion a
non-equi range join plans as (often BroadcastNestedLoopJoin, banned by
this repo's plan-discipline sweep).

Scale notes (100 TB): the exchange partitions by join key, so a hot key
(one service producing half the corpus) serializes into one task's sort.
Spill-safe (sort-based window), but for pathological skew pre-bucket the
facts by coarse time range and union per-bucket boundary snapshots of
the dimension — the standard sharded-asof rewrite; not needed for the
bench corpus and intentionally not auto-applied (it duplicates dim rows
per bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "_asof_is_left"
_TS = "_asof_ts"
_MATCH_TS = "_asof_matched_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    how: str = "left",
) -> DataFrame:
    """For each ``left`` row, attach the ``right`` row with the greatest
    ``right_ts <= left_ts`` (``direction='backward'``, inclusive) or the
    smallest ``right_ts >= left_ts`` (``'forward'``) sharing the ``on``
    key(s).

    ``right_cols``: the dimension columns to carry (default: every right
    column except the key(s) and ``right_ts``); names must not collide
    with left columns. Ties on ``right_ts`` within a key resolve to the
    row that sorts last by the first carried column — keep (key, ts)
    unique on the right side for deterministic output, as every as-of
    implementation assumes.

    ``tolerance_seconds``: when set, a match farther than this from the
    fact timestamp is nulled out (kept with ``how='left'``, dropped with
    ``how='inner'``).

    ``how``: 'left' keeps unmatched facts with null dimension columns;
    'inner' drops them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward': {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner': {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    collide = set(right_cols) & set(left.columns)
    if collide:
        raise ValueError(f"right_cols collide with left columns: {sorted(collide)}")

    left_cols = list(left.columns)
    tagged_left = left.select(
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.col(left_ts).alias(_TS),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(_MATCH_TS),
        F.lit(1).alias(_SIDE),
    )
    tagged_right = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in keys
            else F.col(c)
            for c in left_cols
        ],
        *right_cols,
        F.col(right_ts).alias(_TS),
        F.col(right_ts).alias(_MATCH_TS),
        F.lit(0).alias(_SIDE),
    )
    both = tagged_left.unionByName(tagged_right)

    # Backward: ascending scan, dimension rows sort BEFORE facts at equal
    # ts (side 0 < 1) so an exactly-coincident version is visible —
    # matching the inclusive >= of e.g. DuckDB/pandas ASOF semantics.
    # Forward: the mirror image on a descending scan.
    order = [F.col(_TS).asc(), F.col(_SIDE).asc()]
    if direction == "forward":
        order = [F.col(_TS).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
        F.last(_MATCH_TS, ignorenulls=True).over(w).alias(_MATCH_TS),
        F.col(_SIDE),
    ).filter(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        dist = F.abs(
            F.col(left_ts).cast("double") - F.col(_MATCH_TS).cast("double")
        )
        in_tol = F.col(_MATCH_TS).isNotNull() & (dist <= F.lit(tolerance_seconds))
        carried = carried.select(
            *left_cols,
            *[F.when(in_tol, F.col(c)).alias(c) for c in right_cols],
            F.when(in_tol, F.col(_MATCH_TS)).alias(_MATCH_TS),
            F.col(_SIDE),
        )
    if how == "inner":
        carried = carried.filter(F.col(_MATCH_TS).isNotNull())
    return carried.drop(_SIDE, _MATCH_TS)
