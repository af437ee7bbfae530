"""Line serializers ("handlers").

Byte-compatible re-implementations of the reference's five output encoders
(`/root/reference/handler.go:15-144`). These are plain-Python functions on
(labels, values) lists so they can run vectorized inside the engine's single
``mapInPandas`` pass (and be unit-tested directly). ``json.dumps`` /
``F.to_json`` are NOT used: the reference escapes only ``\\ " \\n \\r \\t``
and passes every other byte through raw (`handler.go:127-144`), which differs
from standard JSON encoders.

Semantics shared by all handlers (`handler.go` loops): iterate values, guard
``i < len(labels)`` — extra values are dropped, missing values truncate.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

LineHandler = Callable[[Sequence[str], Sequence[str], bool], str]

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_ESCAPE_TRANS = str.maketrans(_ESCAPES)


def escape_string(s: str) -> str:
    """writeEscapedString (handler.go:127-144): only 5 escapes, rest raw."""
    return s.translate(_ESCAPE_TRANS)


def json_line_handler(labels: Sequence[str], values: Sequence[str], _is_first: bool = False) -> str:
    """NDJSON object, insertion-ordered keys, all values quoted strings
    (handler.go:15-34)."""
    n = len(labels)
    parts = [
        f'"{labels[i]}":"{escape_string(v)}"'
        for i, v in enumerate(values)
        if i < n
    ]
    return "{" + ",".join(parts) + "}"


def pretty_json_line_handler(labels: Sequence[str], values: Sequence[str], _is_first: bool = False) -> str:
    """Indented multi-line JSON (handler.go:37-56)."""
    n = len(labels)
    parts = [
        f'  "{labels[i]}": "{escape_string(v)}"'
        for i, v in enumerate(values)
        if i < n
    ]
    return "{\n" + ",\n".join(parts) + "\n}"


def kv_pair_line_handler(labels: Sequence[str], values: Sequence[str], _is_first: bool = False) -> str:
    """Space-joined k="v" pairs (handler.go:59-75)."""
    n = len(labels)
    parts = [
        f'{labels[i]}="{escape_string(v)}"'
        for i, v in enumerate(values)
        if i < n
    ]
    return " ".join(parts)


def ltsv_line_handler(labels: Sequence[str], values: Sequence[str], _is_first: bool = False) -> str:
    """Tab-joined k:v, empty value -> "-" (handler.go:78-96)."""
    n = len(labels)
    parts = [
        f"{labels[i]}:{v if v else '-'}"
        for i, v in enumerate(values)
        if i < n
    ]
    return "\t".join(parts)


def tsv_line_handler(labels: Sequence[str], values: Sequence[str], is_first: bool = False) -> str:
    """Tab-joined values, empty -> "-", header row prepended when is_first
    (handler.go:99-123). No ANSI color (non-tty path)."""
    n = len(labels)
    body = "\t".join(
        (v if v else "-") for i, v in enumerate(values) if i < n
    )
    if is_first:
        return "\t".join(labels) + "\n" + body
    return body


HANDLERS: dict[str, LineHandler] = {
    "json": json_line_handler,
    "pretty_json": pretty_json_line_handler,
    "kv": kv_pair_line_handler,
    "ltsv": ltsv_line_handler,
    "tsv": tsv_line_handler,
}


def apply_prefix(line: str, prefix: str) -> str:
    """Prefix every physical line of a (possibly multi-line) record
    (parser_core.go:323-334)."""
    return "\n".join(prefix + part for part in line.split("\n"))


MATCHED_PREFIX = "[ PROCESSED ] "
UNMATCHED_PREFIX = "[ UNMATCHED ] "

# tty path (parser_core.go:187-188): bold green / bold red around the
# prefix, reset after — byte-for-byte the reference's escape sequences
ANSI_MATCHED_PREFIX = "\033[1;32m" + MATCHED_PREFIX + "\033[0m"
ANSI_UNMATCHED_PREFIX = "\033[1;31m" + UNMATCHED_PREFIX + "\033[0m"


def prefix_strings(color: bool) -> tuple[str, str]:
    """(matched, unmatched) prefix pair for the tty/no-tty paths."""
    if color:
        return ANSI_MATCHED_PREFIX, ANSI_UNMATCHED_PREFIX
    return MATCHED_PREFIX, UNMATCHED_PREFIX
