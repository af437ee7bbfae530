"""CDXJ index scan — the URL-index tier of a web-archive stack.

CDXJ is the line-oriented index format used by Common Crawl's URL index
and pywb (public format: one record per line, ``<SURT key> <14-digit
timestamp> <JSON block>``). Together with the WARC / WET / WAT scans in
``sources/warc.py`` this completes the Common Crawl on-disk family:
content, extracted text, metadata, and now the index.

Reference parity note: the reference engine's closest machinery is its
line-oriented preset decode (parser_regex.go) — first-match extraction
with unmatched lines surfaced, which is exactly the discipline here:
malformed lines are NOT dropped, they come back with ``valid = false``
and the raw line retained, preserving the repo's counters invariant
(total = valid + invalid is derivable per source file).

Scale notes: the parse is a pure expression chain over a line scan —
regexp field split + ``get_json_object`` (both JVM-side, whole-stage
codegen), zero Python, zero shuffles. At 100 TB the index arrives as
many splits; nothing here resists partition parallelism. Filters on
``surt`` prefix push down to the line scan's partition pruning when the
index is stored range-partitioned on the SURT key (see
webtext.surt_key's locality note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: canonical CDXJ JSON field -> (column name, cast type); length/offset
#: are stringified ints in the wild (pywb writes them as JSON strings).
_JSON_FIELDS = [
    ("url", "url", "string"),
    ("mime", "mime", "string"),
    ("status", "status", "int"),
    ("digest", "digest", "string"),
    ("length", "length", "long"),
    ("offset", "offset", "long"),
    ("filename", "filename", "string"),
]


def parse_cdxj_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ lines into typed columns. A line is valid when it has
    a non-empty SURT key, a 14-digit timestamp, and a JSON block that
    yields a ``url``. Invalid lines keep ``raw`` and ``valid = false``
    with NULL fields — the caller decides whether to route them to an
    unmatched sink (the reference's unmatched-line discipline).

    Output: (surt, ts timestamp, url, mime, status int, digest,
    length long, offset long, filename, valid boolean, raw).
    """
    line = F.col(line_col)
    surt = F.regexp_extract(line, r"^(\S+) \d{14} ", 1)
    ts_raw = F.regexp_extract(line, r"^\S+ (\d{14}) ", 1)
    js = F.regexp_replace(line, r"^\S+ \d{14} ", "")
    cols = {
        name: F.get_json_object(js, f"$.{field}").cast(typ)
        for field, name, typ in _JSON_FIELDS
    }
    valid = (surt != "") & (ts_raw != "") & cols["url"].isNotNull()
    out = df.select(
        F.when(valid, surt).alias("surt"),
        F.when(
            valid, F.to_timestamp(ts_raw, "yyyyMMddHHmmss")
        ).alias("ts"),
        *[F.when(valid, c).alias(n) for n, c in cols.items()],
        valid.alias("valid"),
        line.alias("raw"),
    )
    return out


def read_cdxj(spark, path_glob: str) -> DataFrame:
    """CDXJ files -> parsed records (spark.read.text line scan; gzip
    transparently handled by the Hadoop codec, like the reference's
    gzip source)."""
    return parse_cdxj_lines(
        spark.read.text(path_glob).withColumnRenamed("value", "line")
    )
