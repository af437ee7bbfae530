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
    color: bool | None = None             # ANSI prefixes: None = auto (tty)

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

    def resolve_color(self) -> bool:
        """The reference colors prefixes when stdout is a terminal
        (parser_core.go:186-189, isatty.IsTerminal); ``color`` overrides
        the auto-detection either way."""
        if self.color is not None:
            return self.color
        import sys

        try:
            return sys.stdout.isatty()
        except Exception:
            return False
