"""Compare two bench result files (driver BENCH_r*.json snapshots or raw
`bench.py` output lines) and print per-query deltas + headline/scaling
changes — the round-over-round ledger table, automated.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N]

Handles both shapes:
  - bench.py stdout JSON: {"metric": ..., "queries": {...}, "scaling": ...}
  - driver snapshots:     {"n": ..., "tail": "<truncated stdout>", ...}
    (query timings are regex-scraped from the tail; truncation-safe)
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_META_KEYS = {
    "sf", "docs", "lines", "docs_per_sec", "lines_per_sec", "value",
    "cores_small", "cores_big", "elapsed_small", "elapsed_big",
    "efficiency", "paired_efficiency", "loadavg_at_start",
}


def load(path: str) -> dict:
    raw = json.load(open(path))
    if "queries" in raw:
        return raw
    text = raw.get("tail", "") or ""
    m = re.search(r'\{"metric".*', text)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    # truncated tail: scrape "name": <float> pairs until a metadata key
    queries: dict[str, float] = {}
    for k, v in re.findall(r'"([a-z0-9_]+)":\s*(-?[0-9.]+)', text):
        if k in _META_KEYS:
            break
        queries[k] = float(v)
    return {"queries": queries}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    if not common:
        print("no common queries between the two files", file=sys.stderr)
        return 1
    deltas = sorted(((qn[k] - qo[k], k) for k in common), reverse=True)
    print(f"{len(common)} common queries; "
          f"total {sum(qo[k] for k in common):.1f}s -> "
          f"{sum(qn[k] for k in common):.1f}s")
    print(f"only in old: {sorted(set(qo) - set(qn))or '-'}")
    print(f"only in new: {sorted(set(qn) - set(qo)) or '-'}")
    print(f"\nworst {args.top} regressions (delta s, old -> new):")
    for d, k in deltas[: args.top]:
        print(f"  {d:+6.2f}  {k}: {qo[k]} -> {qn[k]}")
    print(f"\nbest {args.top} improvements:")
    for d, k in deltas[-args.top:][::-1]:
        print(f"  {d:+6.2f}  {k}: {qo[k]} -> {qn[k]}")
    for side, data in (("old", old), ("new", new)):
        sc = data.get("scaling") or {}
        if sc:
            print(f"\n{side} scaling: efficiency={sc.get('efficiency')} "
                  f"(paired_median={sc.get('efficiency_paired_median')}); "
                  f"headline={data.get('docs_per_sec')} docs/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
