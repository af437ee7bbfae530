"""Structured Streaming tests: availableNow incremental runs resume from
checkpoint; watermarked windowed aggregation plan is streaming-valid."""

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.pages import synth_pages
from access_log_parser_spark.sinks import read_sink
from access_log_parser_spark.streaming import run_stream_once, windowed_status_counts


def test_available_now_resume(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = synth_pages(spark, 20, 10, 5)
    pages.write.mode("overwrite").parquet(pages_dir)
    run_stream_once(spark, pages_dir, pages.schema, out_dir, ckpt, fmt="s3")
    first = read_sink(spark, out_dir).count()
    assert first == 20 * 10

    # second invocation: checkpoint says everything is processed -> no dup
    run_stream_once(spark, pages_dir, pages.schema, out_dir, ckpt, fmt="s3")
    assert read_sink(spark, out_dir).count() == first

    # new data arrives -> only the delta is processed
    more = synth_pages(spark, 10, 10, 5).withColumn(
        "url", F.concat(F.lit("late-"), F.col("url"))
    )
    more.write.mode("append").parquet(pages_dir)
    run_stream_once(spark, pages_dir, pages.schema, out_dir, ckpt, fmt="s3")
    assert read_sink(spark, out_dir).count() == first + 10 * 10


def test_windowed_counts_batch_semantics(spark):
    # run the windowed agg in batch mode to pin its semantics
    pages = synth_pages(spark, 10, 5, 5)
    from access_log_parser_spark.engine import parse_routed
    from access_log_parser_spark.sources.text import explode_lines

    lines = explode_lines(pages, text_col="text", source_col="url", keep=("warc_ts",))
    routed = parse_routed(lines.select("source", "line_no", "raw"), "s3").join(
        lines.select("source", "line_no", "warc_ts"), ["source", "line_no"]
    )
    counts = windowed_status_counts(routed, window="1 hour").collect()
    assert sum(r["rows"] for r in counts) == 50
    assert {r["status"] for r in counts} == {"matched", "unmatched"}
