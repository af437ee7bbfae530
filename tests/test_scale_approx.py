"""Scale-path approximate operators vs their exact twins.

At 100 TB, exact distinct counts and exact quantiles are shuffle-heavy;
the scale path is mergeable sketches (HLL) and approxQuantile. These
tests pin that the approximations stay within their documented error
bounds of the exact operators on the shared events table — and that HLL
sketches MERGE correctly across partitions (the property that lets each
executor sketch locally and union at the driver)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_approx_count_distinct_within_5pct(events):
    exact = events.select(F.countDistinct("user_id")).first()[0]
    approx = events.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= max(1, 0.05 * exact)


def test_hll_sketch_union_across_groups_matches_global(events):
    """Per-event_type sketches unioned == sketch of the whole column:
    the mergeability that makes distinct-counting embarrassingly
    parallel (sketch per partition/executor, union at the driver)."""
    per_group = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    exact = events.select(F.countDistinct("user_id")).first()[0]
    assert abs(merged - exact) <= max(1, 0.05 * exact)


def test_approx_quantile_brackets_exact_median(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    (approx_med,) = docs.approxQuantile("n_chars", [0.5], 0.01)
    ordered = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    lo = ordered[max(0, int(0.49 * len(ordered)) - 1)]
    hi = ordered[min(len(ordered) - 1, int(0.51 * len(ordered)) + 1)]
    assert lo <= approx_med <= hi
