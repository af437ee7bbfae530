from .text import (
    explode_lines,
    lines_from_files,
    lines_from_gzip,
    lines_from_string,
)
from .ziparchive import lines_from_zip_entries

__all__ = [
    "explode_lines",
    "lines_from_files",
    "lines_from_gzip",
    "lines_from_string",
    "lines_from_zip_entries",
]
