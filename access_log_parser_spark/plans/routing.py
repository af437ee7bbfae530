"""Declarative routing plans.

Fan-out routing beyond the default (status, pattern_id) partitioning:
named sinks selected by arbitrary Column predicates over the routed rows
(match-status, pattern-id, or any decoded field on the structured
surface). Routes are plain filters on one shared upstream plan, so
Catalyst reuses the parse stage and pushes each route's predicate down;
rows may match multiple routes (fan-out, not partition) unless
``exclusive`` is set, in which case first-match-wins like the reference's
pattern cascade.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RouteRule:
    name: str
    predicate: Column


def route(
    df: DataFrame, rules: list[RouteRule], exclusive: bool = False
) -> dict[str, DataFrame]:
    """Split ``df`` into named sink DataFrames by predicate."""
    out: dict[str, DataFrame] = {}
    if not exclusive:
        for r in rules:
            out[r.name] = df.filter(r.predicate)
        return out
    claimed: Column | None = None
    for r in rules:
        pred = r.predicate if claimed is None else (r.predicate & ~claimed)
        out[r.name] = df.filter(pred)
        claimed = r.predicate if claimed is None else (claimed | r.predicate)
    return out


def default_rules() -> list[RouteRule]:
    """The reference's implicit routes: matched -> main sink, unmatched ->
    errors sink (parser_core.go:207-219,241-243)."""
    return [
        RouteRule("sink_matched", F.col("status") == "matched"),
        RouteRule("sink_unmatched", F.col("status") == "unmatched"),
        RouteRule("sink_excluded", F.col("status") == "excluded"),
        RouteRule("sink_skipped", F.col("status") == "skipped"),
    ]
