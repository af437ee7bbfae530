"""Plan-shape discipline sweep: EVERY driver query's physical plan is
checked for forbidden join strategies. A CartesianProduct anywhere, or a
BroadcastNestedLoopJoin outside the explicit allowlist, means an
operator silently degenerated to all-pairs — the failure mode that is
invisible at sf0.001 and fatal at 100 TB."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# Queries that RUN work during construction (streaming awaitTermination)
# rather than returning a lazy frame — their plans are covered by their
# own end-to-end tests instead.
SKIP = {
    "stream_hourly_counts",
    "stream_parse_counts",
    "stream_windowed_counts",
    "stream_paragraph_dedup",
}

# Intentional broadcast nested-loop joins: a tiny broadcast side times the
# corpus IS the chosen plan (|queries| is small by contract).
BNLJ_ALLOWED = {
    "ann_cosine_topk",  # corpus x broadcast(query-set) product, then top-k
    "idf_tokens",       # 1-row broadcast side (corpus size scalar)
}


def _query_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _query_names())
def test_no_forbidden_join_shapes(spark, name):
    if name in SKIP:
        pytest.skip("streaming query: executes during construction")
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} has an unplanned nested-loop join"
        )
