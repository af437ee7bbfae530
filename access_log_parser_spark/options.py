"""Parse options, mirroring the reference ``Option`` struct
(`/root/reference/parser_core.go:57-65`)."""

from __future__ import annotations

from dataclasses import dataclass

from .handlers import HANDLERS, LineHandler


@dataclass(frozen=True)
class Option:
    labels: tuple[str, ...] = ()          # fields to output, by label name
    filters: tuple[str, ...] = ()         # filter-DSL expressions (AND-ed)
    skip_lines: tuple[int, ...] = ()      # 1-based line numbers to skip
    prefix: bool = False                  # decorate output lines
    unmatch_lines: bool = False           # emit unmatched raw lines to output
    line_number: bool = False             # prepend "no" label
    line_handler: LineHandler | str = "json"  # serializer (default JSONLineHandler)

    def __post_init__(self) -> None:
        # allow lists for ergonomics
        for name in ("labels", "filters", "skip_lines"):
            v = getattr(self, name)
            if not isinstance(v, tuple):
                object.__setattr__(self, name, tuple(v))

    def resolve_handler(self) -> LineHandler:
        if callable(self.line_handler):
            return self.line_handler
        return HANDLERS[self.line_handler]
