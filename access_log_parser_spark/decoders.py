"""Line decoders: regex first-match-wins cascade and LTSV.

Plain-Python batch decoders used inside the engine's ``mapInPandas`` pass.
Semantics match `/root/reference/parser_core.go:259-288`:

- regex: ordered pattern list, first match wins, match index = pattern_id;
  no pattern matched -> unmatched; empty pattern list -> hard error;
- LTSV: tab-split then split each field on the first ``:``; any field
  without ``:`` invalidates the WHOLE line (unmatched).

The cascade is vectorized per Arrow batch: pattern 0 is applied to all
lines, pattern 1 only to the misses, etc. — on real log corpora pattern 0
matches the vast majority, so later (cheaper-to-skip) patterns see tiny
miss-sets.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

PARSE_ERROR = "cannot parse input"

# status codes carried through the pipeline
MATCHED = "matched"
UNMATCHED = "unmatched"
EXCLUDED = "excluded"
SKIPPED = "skipped"


class NoPatternError(ValueError):
    def __init__(self) -> None:
        super().__init__(f"{PARSE_ERROR}: no pattern provided")


def regex_decode_batch(
    lines: Sequence[str],
    patterns: Sequence[re.Pattern],
    names: Sequence[Sequence[str]],
) -> tuple[list[int], list[list[str] | None]]:
    """Decode a batch of lines against the pattern cascade.

    Returns (pattern_ids, values) where pattern_id is -1 and values None
    for unmatched lines; values are the positional capture-group strings of
    the winning pattern (labels = names[pattern_id]).
    """
    if not patterns:
        raise NoPatternError
    from .patterns import fast_twin

    n = len(lines)
    pids = [-1] * n
    vals: list[list[str] | None] = [None] * n
    pending = range(n)
    for pid, pat in enumerate(patterns):
        if not pending:
            break
        search = pat.search
        # tab-separated patterns get a guarded backtracking-free twin
        # (~67x on CloudFront); see patterns.fast_twin for the soundness
        # argument — twin and original are exchangeable exactly when the
        # line's tab count equals the separator count.
        twin = fast_twin(pat)
        if twin is not None:
            fast_search, n_tabs = twin[0].search, twin[1]
        misses = []
        for i in pending:
            line = lines[i]
            if twin is not None and line.count("\t") == n_tabs:
                m = fast_search(line)
            else:
                m = search(line)
            if m is not None:
                pids[i] = pid
                # Go returns "" for unparticipating groups (matches[1:]);
                # re gives None -> normalize to "".
                vals[i] = ["" if g is None else g for g in m.groups()]
            else:
                misses.append(i)
        pending = misses
    return pids, vals


def ltsv_decode_batch(
    lines: Sequence[str],
) -> tuple[list[list[str] | None], list[list[str] | None]]:
    """Decode LTSV lines; returns (labels, values), None/None when invalid."""
    out_ls: list[list[str] | None] = []
    out_vs: list[list[str] | None] = []
    for line in lines:
        ls: list[str] = []
        vs: list[str] = []
        ok = True
        for fld in line.split("\t"):
            label, sep, value = fld.partition(":")
            if not sep:
                ok = False
                break
            ls.append(label)
            vs.append(value)
        if ok:
            out_ls.append(ls)
            out_vs.append(vs)
        else:
            out_ls.append(None)
            out_vs.append(None)
    return out_ls, out_vs


def select_labels(
    targets: Sequence[str], labels: Sequence[str], values: Sequence[str]
) -> tuple[list[str], list[str]]:
    """Keep original line order, silently drop unknown targets
    (parser_core.go:291-305)."""
    tset = set(targets)
    ls: list[str] = []
    vs: list[str] = []
    for j, label in enumerate(labels):
        if label in tset:
            ls.append(label)
            vs.append(values[j])
    return ls, vs
