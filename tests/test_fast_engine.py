"""Fast-path (JVM serialization) vs compat-path equivalence: both engines
must produce identical routed rows for every supported Option combination
on the golden corpus."""

import pytest
from pyspark.sql import functions as F

import golden_s3 as g
from access_log_parser_spark import Option
from access_log_parser_spark.engine import fast_parse_routed, parse_routed
from access_log_parser_spark.pages import pages_to_lines, synth_pages
from access_log_parser_spark.sources import lines_from_string


def collect(routed):
    return sorted(
        (r["source"], r["line_no"], r["status"], r["pattern_id"], r["out_line"], r["raw"])
        for r in routed.collect()
    )


OPTIONS = [
    Option(),
    Option(line_number=True),
    Option(skip_lines=[2, 4], line_number=True),
    Option(filters=["error_code == NoSuchBucketPolicy"]),
    Option(filters=["bytes_sent >= 200", "http_status == 200"]),
    Option(labels=["bucket", "method", "http_status"]),
    Option(unmatch_lines=True, prefix=True),
    Option(line_handler="kv", labels=["bucket"]),
    Option(line_handler="ltsv"),
    Option(line_handler="tsv", labels=["bucket", "method"]),
    Option(line_handler="pretty_json", labels=["bucket"], prefix=True),
]


@pytest.mark.parametrize("opt", OPTIONS, ids=[str(i) for i in range(len(OPTIONS))])
def test_fast_matches_compat_golden(spark, opt):
    lines = lines_from_string(spark, g.CONTAINS_UNMATCH_INPUT)
    assert collect(fast_parse_routed(lines, "s3", opt)) == collect(
        parse_routed(lines, "s3", opt)
    )


@pytest.mark.parametrize("opt", OPTIONS[:7], ids=[str(i) for i in range(7)])
def test_jvm_decoder_matches_compat(spark, opt):
    lines = lines_from_string(spark, g.CONTAINS_UNMATCH_INPUT)
    assert collect(fast_parse_routed(lines, "s3", opt, decoder="jvm")) == collect(
        parse_routed(lines, "s3", opt)
    )


def test_jvm_decoder_fallback_patterns(spark):
    # fallback pattern ids survive the zero-Python plan
    from access_log_parser_spark.functions.jvm_decode import extract_fields_jvm
    from access_log_parser_spark.engine import extract_fields

    pages = synth_pages(spark, 20, 10, 5)
    lines = pages_to_lines(pages)
    a = extract_fields(lines, "s3", passthrough=["source", "line_no"])
    b = extract_fields_jvm(lines, "s3", passthrough=["source", "line_no"])
    key = lambda r: (r["source"], r["line_no"])
    ra = sorted(map(tuple, a.collect()), key=lambda t: (t[0], t[1]))
    rb = sorted(map(tuple, b.collect()), key=lambda t: (t[0], t[1]))
    assert ra == rb


def test_fast_matches_compat_synth_corpus(spark):
    lines = pages_to_lines(synth_pages(spark, 30, 10, 5))
    opt = Option(line_number=True)
    assert collect(fast_parse_routed(lines, "s3", opt)) == collect(
        parse_routed(lines, "s3", opt)
    )


def test_fast_rejects_ltsv_and_custom_handlers(spark):
    lines = lines_from_string(spark, g.ALL_MATCH_INPUT)
    with pytest.raises(ValueError):
        fast_parse_routed(lines, "ltsv")
    with pytest.raises(ValueError):
        fast_parse_routed(lines, "s3", Option(line_handler=lambda a, b, c: ""))


def test_pipeline_auto_uses_fast(spark, tmp_path):
    from access_log_parser_spark.pipeline import run_pipeline
    from access_log_parser_spark.sinks import read_sink

    pages = synth_pages(spark, 20, 10, 5)
    rep = run_pipeline(spark, pages, str(tmp_path / "o"), fmt="s3", engine="auto")
    assert rep.result.counters() == (200, 160, 40, 0, 0)
    assert read_sink(spark, str(tmp_path / "o")).count() == 200


def test_jvm_cloudfront_twin_equivalence_adversarial(spark):
    """JVM decoder's guarded tab-twin must agree with the Python decoder
    on adversarial CloudFront lines (extra/missing tabs, quotes, spaces)."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.functions.jvm_decode import extract_fields_jvm
    from tests.test_fast_twin import ADVERSARIAL

    lines = spark.createDataFrame(
        [(str(i), i + 1, s) for i, s in enumerate(ADVERSARIAL)],
        ["source", "line_no", "raw"],
    )
    py = extract_fields(lines, "cloudfront", passthrough=["source"])
    jvm = extract_fields_jvm(lines, "cloudfront", passthrough=["source"])
    a = sorted(map(tuple, py.collect()))
    b = sorted(map(tuple, jvm.collect()))
    assert a == b
