"""Pure-JVM regex decode: zero Python on the hot path.

Each preset pattern is converted to Java-regex syntax (named groups
``(?P<x>...)`` -> anonymous ``(...)``; group order carries the names) and
applied as ONE ``regexp_replace`` that rewrites the matched line into its
capture groups joined by an ``\\x01`` separator; "output == input" marks a
non-match, giving first-match-wins without a second regex execution.
Everything stays inside whole-stage codegen — no Arrow transfer, no Python
workers — at the cost of two caveats vs the Python decoder:

- Java and Python regex semantics agree on the preset grammar subset
  (verified byte-for-byte on the golden corpus) but user-supplied patterns
  using Python-only syntax would diverge — the engine keeps the Python
  path as the reference-parity default for user patterns;
- a line that legitimately CONTAINS ``\\x01`` would split wrongly; the
  preset grammars exclude control characters, so this cannot occur for
  matched lines.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from .. import patterns as pat

SEP = "\x01"


def to_java_regex(pattern: str) -> str:
    """Python named groups -> Java anonymous groups (Java group names
    reject underscores, so names cannot be preserved)."""
    return re.sub(r"\(\?P<[^>]+>", "(", pattern)


def extract_fields_jvm(
    lines_df: DataFrame,
    fmt: str | Sequence[str],
    passthrough: Sequence[str] = (),
    line_col: str = "raw",
    raw_when_unmatched: bool = False,
) -> DataFrame:
    """Same output contract as :func:`..engine.extract_fields`, computed
    entirely with Catalyst expressions."""
    pattern_strs = (
        list(pat.PRESETS[fmt]) if isinstance(fmt, str) else [str(p) for p in fmt]
    )
    compiled = [pat.validate_pattern(p) for p in pattern_strs]
    union = pat.union_schema(compiled)
    names = [pat.group_names(c) for c in compiled]

    raw = F.col(line_col)
    rewritten: list[Column] = []
    for i, cp in enumerate(compiled):
        repl = SEP.join(f"${j}" for j in range(1, cp.groups + 1))
        jp = "(?s)" + to_java_regex(pattern_strs[i]) + ".*$"
        base = F.regexp_replace(raw, jp, repl)
        # Java regex backtracks on tab-spanning negated classes exactly
        # like Python (patterns.fast_twin docstring); same guarded twin,
        # guard evaluated per row as a Catalyst CASE
        twin = pat.fast_twin(cp)
        if twin is not None:
            twin_jp = "(?s)" + to_java_regex(twin[0].pattern) + ".*$"
            tab_count = F.length(raw) - F.length(
                F.replace(raw, F.lit("\t"), F.lit(""))
            )
            base = F.when(
                tab_count == twin[1], F.regexp_replace(raw, twin_jp, repl)
            ).otherwise(base)
        rewritten.append(base)

    pid: Column | None = None
    vals: Column | None = None
    for i, e in enumerate(rewritten):
        changed = e != raw
        pid = F.when(changed, F.lit(i)) if pid is None else pid.when(changed, F.lit(i))
        v = F.split(e, SEP)
        vals = F.when(changed, v) if vals is None else vals.when(changed, v)
    pid = pid.otherwise(F.lit(-1)).cast(IntegerType())

    out = lines_df.select(
        *passthrough,
        raw.alias("_raw"),
        pid.alias("pattern_id"),
        vals.alias("_vals"),
    )
    field_cols = []
    for name in union:
        # per-pattern position of this union field (1-based for element_at)
        expr: Column | None = None
        for i, ns in enumerate(names):
            if name in ns:
                k = ns.index(name) + 1
                cond = F.col("pattern_id") == i
                e = F.element_at(F.col("_vals"), k)
                expr = F.when(cond, e) if expr is None else expr.when(cond, e)
        field_cols.append(expr.alias(name))
    cols = [*passthrough, "pattern_id"]
    if raw_when_unmatched:
        cols.append(
            F.when(F.col("pattern_id") < 0, F.col("_raw")).alias("raw")
        )
    return out.select(*cols, *field_cols)
