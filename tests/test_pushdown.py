"""Plan-shape assertions: predicate pushdown, partition pruning, column
pruning — the scan must never read what the query doesn't need
(SURVEY.md §4, "Push down and prune")."""

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.pages import synth_pages


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages") / "tbl")
    synth_pages(spark, 100, 5, 5).write.partitionBy("lang").parquet(d)
    return d


def test_partition_pruning(spark, pages_dir):
    df = spark.read.parquet(pages_dir).filter(F.col("lang") == "en").select("url")
    plan = plan_of(df)
    # lang=en must be a partition filter on the scan, not a post-scan Filter
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]


def test_predicate_pushdown_to_parquet(spark, pages_dir):
    df = (
        spark.read.parquet(pages_dir)
        .filter(F.col("page_id") > 50)
        .select("url", "page_id")
    )
    plan = plan_of(df)
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThan(page_id,50)" in pushed


def test_column_pruning_html_never_read(spark, pages_dir):
    # parsing only needs text: the multi-MB html binary column must be
    # absent from ReadSchema (SURVEY.md §4: "never read html when only
    # text is parsed")
    from access_log_parser_spark.engine import parse_routed
    from access_log_parser_spark.sources.text import explode_lines

    pages = spark.read.parquet(pages_dir)
    lines = explode_lines(pages, text_col="text", source_col="url")
    routed = parse_routed(lines, "s3")
    plan = plan_of(routed.groupBy("status").count())
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" in read_schema
    assert "html" not in read_schema


def test_documents_scan_prunes_to_needed_columns(spark):
    from access_log_parser_spark.operators.text_quality import token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(token_count(docs))
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema
