"""Line sources: string / file / gzip / document-text scans.

The reference scans lines with ``bufio.Scanner``
(`/root/reference/parser_core.go:190-201`): split on ``\\n``, tolerate a
``\\r\\n`` terminator, no trailing empty line for newline-terminated input,
1-based line numbers per source. :func:`explode_lines` reproduces exactly
that with pure Catalyst expressions (``split`` + ``posexplode``), so
document-level predicates still push down to the scan and no Python runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "url",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(source, text) -> (source, line_no, raw) with scanner semantics.

    ``line_no`` is 1-based within each source document — the coordinate
    system of the reference's Errors table (parser_result.go:33-35).
    """
    # strip exactly one trailing newline at absolute end (\z anchor avoids
    # Java's $-before-final-terminator surprise), then split on \r?\n
    t = F.regexp_replace(F.col(text_col), r"\r?\n\z", "")
    lines = F.split(t, r"\r?\n")
    out = (
        df.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
        .select(
            F.col(source_col).alias("source"),
            *[F.col(c) for c in keep],
            F.posexplode(lines).alias("pos", "raw"),
        )
        .withColumn("line_no", (F.col("pos") + 1).cast("long"))
        .drop("pos")
    )
    return out.select("source", "line_no", "raw", *keep)


def lines_from_string(spark: SparkSession, s: str, source: str = "") -> DataFrame:
    """ParseString equivalent (parser_core.go:92-99)."""
    df = spark.createDataFrame([(source, s)], "source string, text string")
    return explode_lines(df, text_col="text", source_col="source")


def lines_from_files(spark: SparkSession, path: str) -> DataFrame:
    """ParseFile equivalent (parser_core.go:104-117); ``source`` is the file
    basename (parser_core.go:114). ``wholetext`` keeps exact per-file line
    numbering; Spark distributes across files (one split per file), which is
    the right granularity for many-file log corpora."""
    # NB: .option("wholetext", ...) is silently ignored by the Spark 4.1
    # text reader; only the reader kwarg applies the whole-file mode
    df = (
        spark.read.text(path, wholetext=True)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
            F.col("value").alias("text"),
        )
    )
    return explode_lines(df, text_col="text", source_col="source")


def lines_from_gzip(spark: SparkSession, path: str) -> DataFrame:
    """ParseGzip equivalent (parser_core.go:122-135): Hadoop's codec layer
    decompresses ``*.gz`` transparently, so this is the same scan."""
    return lines_from_files(spark, path)


def basename(path: str) -> str:
    return os.path.basename(path)
