"""COVERAGE.md <-> driver-contract consistency: every query name marked
with the oracle symbol (§) in the coverage map must exist in
__spark_entry__.queries(), and oracle-marked names must have oracle_sql()
entries. Guards the judge-facing doc against rot as queries evolve."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def test_coverage_query_names_exist():
    import __spark_entry__ as entry

    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    text = open("/root/repo/COVERAGE.md").read()
    # exclude doc-section references like "SURVEY.md §2"
    marked = set(re.findall(r"(?<![.\w])([a-z][a-z0-9_]+) §", text))
    unknown = marked - qs
    assert not unknown, f"COVERAGE.md references unknown queries: {sorted(unknown)}"
    missing_oracle = marked - oracles
    assert not missing_oracle, (
        f"COVERAGE.md marks § (oracle-backed) but oracle_sql lacks: "
        f"{sorted(missing_oracle)}"
    )


def test_every_oracle_has_a_query():
    import __spark_entry__ as entry

    qs, oracles = set(entry.queries()), set(entry.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {sorted(oracles - qs)}"
    # CLAUDE.md invariant: EVERY query is oracle-backed (since round 2 the
    # former rows-only pair gained oracles: ann_lsh reproduces the
    # deterministic bucketing in SQL, stream_windowed_counts has the
    # closed-form synth_pages expectation)
    assert qs == oracles, f"rows-only queries remain: {sorted(qs - oracles)}"
