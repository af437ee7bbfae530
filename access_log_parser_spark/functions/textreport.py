"""Text report rendering: byte-faithful Result.String().

Reproduces the reference's summary/unmatch report exactly
(`/root/reference/parser_result.go:40-179` + golden strings in
`parser_result_test.go`): mintab-style text tables (numbers
right-aligned, strings left-aligned, multi-line cells, borders between
records), Go ``time.Duration`` formatting, fold widths 18 (Entry) and 94
(Line), tab escaping, top-10 error truncation with the omit notice.
Non-tty path only (no ANSI colors).
"""

from __future__ import annotations

from collections.abc import Sequence


def go_duration(seconds: float) -> str:
    """Go time.Duration.String() for non-negative durations."""
    ns = round(seconds * 1_000_000_000)
    if ns == 0:
        return "0s"
    if ns < 1_000:
        return f"{ns}ns"

    def frac(value: int, unit_ns: int) -> str:
        whole, rem = divmod(value, unit_ns)
        if rem == 0:
            return str(whole)
        digits = len(str(unit_ns)) - 1
        s = f"{rem:0{digits}d}".rstrip("0")
        return f"{whole}.{s}"

    if ns < 1_000_000:
        return f"{frac(ns, 1_000)}µs"
    if ns < 1_000_000_000:
        return f"{frac(ns, 1_000_000)}ms"
    total_s = ns // 1_000_000_000
    if total_s < 60:
        return f"{frac(ns, 1_000_000_000)}s"
    m, s_ns = divmod(ns, 60 * 1_000_000_000)
    if m < 60:
        return f"{m}m{frac(s_ns, 1_000_000_000)}s"
    h, m = divmod(m, 60)
    return f"{h}h{m}m{frac(s_ns, 1_000_000_000)}s"


def fold(s: str, w: int) -> str:
    """Insert a newline every w runes (parser_result.go:169-179)."""
    out = []
    for i, ch in enumerate(s):
        out.append(ch)
        if (i + 1) % w == 0 and i + 1 < len(s):
            out.append("\n")
    return "".join(out)


def render_table(headers: Sequence[str], rows: Sequence[Sequence[object]]) -> str:
    """mintab FormatText: +---+ borders, 1-space padding, numbers
    right-aligned, strings left-aligned; a cell may be a multi-line string
    or a list (one line per element); border between every record."""
    cell_lines: list[list[list[str]]] = []
    numeric: list[bool] = [True] * len(headers)
    for row in rows:
        lines_per_cell = []
        for j, cell in enumerate(row):
            if isinstance(cell, bool):
                numeric[j] = False
                lines_per_cell.append([str(cell)])
            elif isinstance(cell, int):
                lines_per_cell.append([str(cell)])
            elif isinstance(cell, (list, tuple)):
                numeric[j] = False
                lines_per_cell.append([str(x) for x in cell] or [""])
            else:
                numeric[j] = False
                lines_per_cell.append(str(cell).split("\n"))
        cell_lines.append(lines_per_cell)

    widths = [len(h) for h in headers]
    for rec in cell_lines:
        for j, lines in enumerate(rec):
            for ln in lines:
                widths[j] = max(widths[j], len(ln))

    border = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [border]
    out.append(
        "|" + "|".join(f" {h:<{widths[j]}} " for j, h in enumerate(headers)) + "|"
    )
    out.append(border)
    for rec in cell_lines:
        height = max(len(lines) for lines in rec)
        for k in range(height):
            cells = []
            for j, lines in enumerate(rec):
                val = lines[k] if k < len(lines) else ""
                if numeric[j] and k < len(lines):
                    cells.append(f" {val:>{widths[j]}} ")
                else:
                    cells.append(f" {val:<{widths[j]}} ")
            out.append("|" + "|".join(cells) + "|")
        out.append(border)
    return "\n".join(out) + "\n"


SUM_NOTES = """
Total     : Total number of log line processed
Matched   : Number of log line that successfully matched pattern
Unmatched : Number of log line that did not match any pattern
Excluded  : Number of log line that did not extract by filter expressions
Skipped   : Number of log line that skipped by line number
"""

ERR_NOTES = """
LineNumber : Line number of the log that did not match any pattern
Line       : Raw log line that did not match any pattern
"""


def render_result(
    total: int,
    matched: int,
    unmatched: int,
    excluded: int,
    skipped: int,
    elapsed_seconds: float,
    source: str,
    zip_entries: Sequence[str],
    errors: Sequence[tuple[str, int, str]],
    input_type: str,
    top: int = 10,
) -> str:
    """Result.String() (parser_result.go:40-100). ``input_type`` is one of
    stream/string/file/gzip/zip; ``errors`` are (entry, line_number, line)."""
    headers = ["Total", "Matched", "Unmatched", "Excluded", "Skipped", "ElapsedTime"]
    row: list[object] = [total, matched, unmatched, excluded, skipped,
                         go_duration(elapsed_seconds)]
    if input_type in ("file", "gzip"):
        headers.append("Source")
        row.append(source)
    elif input_type == "zip":
        headers += ["Source", "ZipEntries"]
        row += [source, list(zip_entries)]

    b = []
    if input_type == "stream":
        b.append("\n")
    b.append("\n/* SUMMARY */\n\n")
    b.append(render_table(headers, [row]))
    b.append(SUM_NOTES)

    if errors:
        omit = len(errors) > top
        shown = list(errors)[:top]
        err_rows = []
        for entry, line_no, line in shown:
            folded_line = fold(line, 94).replace("\t", "\\t")
            if input_type == "stream":
                err_rows.append([folded_line])
            elif input_type == "zip":
                err_rows.append([fold(entry, 18), line_no, folded_line])
            else:
                err_rows.append([line_no, folded_line])
        if input_type == "stream":
            err_headers = ["Line"]
        elif input_type == "zip":
            err_headers = ["Entry", "LineNumber", "Line"]
        else:
            err_headers = ["LineNumber", "Line"]
        b.append("\n/* UNMATCH LINES */\n\n")
        b.append(render_table(err_headers, err_rows))
        if omit:
            b.append(f"// Show only the first {top} of {len(errors)} errors\n")
        b.append(ERR_NOTES)
    return "".join(b)
