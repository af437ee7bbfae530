"""N-stage strictly-ordered funnel over an event stream.

Generalizes the classic view -> click -> purchase funnel (the reference
domain's log-analytics staple) to any ordered stage list: a user reaches
stage k iff an event of stage k's type occurs strictly AFTER the user's
first completion of stage k-1. Depth = deepest stage reached (0 = none).

Plan shape at scale: one conditional min-aggregate per stage — each a
small per-user aggregate keyed on user_id (map-side partial, one
hash-shuffle per stage on the SAME key, so co-partitioning is reused) —
chained by inequality semi-conditions, then one left-join cascade onto
the distinct-user frame. No window over the full event stream, no
explode. Stage count is the (small, fixed) query constant; the event
stream is touched once per stage with a pushed-down event_type filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth over ``stages`` (ordered list of event
    types). Returns (user_col, depth) with depth in [0, len(stages)].

    Stage semantics: the stage-k timestamp is the MIN ``order_col`` of a
    stage-k event strictly greater than the user's stage-(k-1) timestamp
    (first-completion chaining — the standard strict funnel).
    """
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    ev = events.select(user_col, order_col, type_col)
    users = ev.select(user_col).distinct()

    reached: list[DataFrame] = []  # reached[k] = (user, e_k) for stage k
    prev: DataFrame | None = None
    for k, stage in enumerate(stages):
        stage_ev = ev.filter(F.col(type_col) == stage)
        if prev is None:
            cur = stage_ev.groupBy(user_col).agg(
                F.min(order_col).alias(f"_e{k}")
            )
        else:
            cur = (
                stage_ev.join(prev, user_col)
                .filter(F.col(order_col) > F.col(f"_e{k - 1}"))
                .groupBy(user_col)
                .agg(F.min(order_col).alias(f"_e{k}"))
            )
        reached.append(cur)
        prev = cur

    out = users
    for k in range(len(stages)):
        out = out.join(reached[k].select(user_col, f"_e{k}"), user_col, "left")
    depth = F.lit(0)
    # build shallow->deep so the DEEPEST stage's when() wraps outermost
    # and wins for users who reached several stages
    for k in range(len(stages)):
        depth = F.when(F.col(f"_e{k}").isNotNull(), k + 1).otherwise(depth)
    return out.select(user_col, depth.alias("depth"))


def funnel_depth_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Users per funnel depth: (depth, n_users)."""
    return funnel_depth(events, stages, user_col, order_col, type_col).groupBy(
        "depth"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
