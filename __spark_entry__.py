"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2 plus
the training-data operators) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each. Log-format
queries synthesize their input lines from the shared ``events`` table with
expressions written in the SQL subset both engines parse identically, so
the oracle can recompute expected parse results in closed form.

Column names are aliased identically on both sides (driver compares
sorted-by-name value hashes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# shared SQL fragments (valid in BOTH Spark SQL and DuckDB)
# --------------------------------------------------------------------------

# Apache-CLF line from an events row; every 10th line is unparseable garbage.
CLF_LINE = """
CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING))
ELSE concat(
  '192.0.2.', CAST(user_id % 200 AS STRING),
  ' - user', CAST(user_id % 50 AS STRING),
  ' [16/Feb/2019:11:23:45 +0000] "GET /', event_type, '/', CAST(event_id AS STRING),
  ' HTTP/1.1" ', CAST(200 + (event_id % 4) * 100 AS STRING),
  ' ', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING),
  ' "-" "ua/', CAST(event_id % 7 AS STRING), '"')
END
""".strip()

# expected CLF fields for non-garbage lines (oracle side)
CLF_FIELDS = {
    "remote_host": "concat('192.0.2.', CAST(user_id % 200 AS STRING))",
    "remote_logname": "'-'",
    "remote_user": "concat('user', CAST(user_id % 50 AS STRING))",
    "datetime": "'[16/Feb/2019:11:23:45 +0000]'",
    "method": "'GET'",
    "request_uri": "concat('/', event_type, '/', CAST(event_id AS STRING))",
    "protocol": "'HTTP/1.1'",
    "status": "CAST(200 + (event_id % 4) * 100 AS STRING)",
    "size": "CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING)",
    "referer": "'-'",
    "user_agent": "concat('ua/', CAST(event_id % 7 AS STRING))",
}

# source/line coordinates: 20 synthetic "files", 1-based line numbers
SRC = "concat('src', CAST(event_id % 20 AS STRING))"
LINE_NO = "CAST(FLOOR(event_id / 20) AS BIGINT) + 1"

# S3 line with trailing-truncation variants: event_id % 3 = 0 -> 28 fields
# (pattern 0), 1 -> 25 fields (pattern 3), 2 -> 20 fields (pattern 4).
S3_BASE20 = """concat(
  'owner', CAST(event_id % 5 AS STRING), ' bucket', CAST(event_id % 7 AS STRING),
  ' [16/Feb/2019:11:23:45 +0000] 192.0.2.', CAST(user_id % 200 AS STRING),
  ' requester', CAST(event_id % 5 AS STRING), ' REQID', CAST(event_id AS STRING),
  ' REST.GET.OBJECT key', CAST(event_id % 11 AS STRING),
  ' "GET /bucket', CAST(event_id % 7 AS STRING), '/key HTTP/1.1" ',
  CAST(200 + (event_id % 3) * 100 AS STRING), ' - ',
  CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING),
  ' - 7 - "-" "S3Console/0.4" vid', CAST(event_id % 13 AS STRING))""".strip()

S3_TAIL25 = "' hostid SigV2 ECDHE-RSA-AES128 AuthHeader bucket.s3.amazonaws.com'"
S3_TAIL28 = "' TLSV1.1 - Yes'"

S3_LINE = f"""
CASE WHEN event_id % 3 = 0 THEN concat({S3_BASE20}, {S3_TAIL25}, {S3_TAIL28})
     WHEN event_id % 3 = 1 THEN concat({S3_BASE20}, {S3_TAIL25})
     ELSE {S3_BASE20}
END
""".strip()

# LTSV line (always valid) — chr(9) is the tab separator in both dialects
LTSV_LINE = """concat(
  'remote_host:192.0.2.', CAST(user_id % 200 AS STRING), chr(9),
  'request:GET /', event_type, ' HTTP/1.1', chr(9),
  'status:', CAST(200 + (event_id % 4) * 100 AS STRING), chr(9),
  'size:', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING))""".strip()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _n(expr: str) -> str:
    return f"CAST({expr} AS STRING)"


# ALB line (31 space-separated fields per patterns.ALB); every 10th garbage
_ALB_FIELDS = [
    "'http'",
    "'2024-01-01T00:00:00.000000Z'",
    f"concat('app/lb', {_n('event_id % 3')}, '/abc')",
    f"concat('192.0.2.', {_n('user_id % 200')}, ':', {_n('1024 + event_id % 1000')})",
    f"concat('10.0.1.', {_n('event_id % 50')}, ':80')",
    f"concat('0.00', {_n('event_id % 10')})",
    "'0.012'",
    "'0.000'",
    _n("200 + (event_id % 4) * 100"),
    "'200'",
    _n("100 + event_id % 900"),
    _n("CAST(FLOOR(value * 100) AS BIGINT)"),
    f"""concat('"GET /', event_type, '/', {_n('event_id')}, ' HTTP/1.1"')""",
    f"""concat('"ua/', {_n('event_id % 7')}, '"')""",
    "'ECDHE-RSA-AES128-GCM-SHA256'",
    "'TLSv1.2'",
    f"concat('arn:tg/t', {_n('event_id % 5')})",
    "'\"Root=1-abcdef\"'",
    f"""concat('"example-', {_n('event_id % 11')}, '.com"')""",
    "'\"arn:cert\"'",
    _n("event_id % 4"),
    "'2024-01-01T00:00:00.000000Z'",
    "'\"forward\"'",
    "'\"-\"'",
    "'\"-\"'",
    f"""concat('"10.0.1.', {_n('event_id % 50')}, ':80"')""",
    "'\"200\"'",
    "'\"-\"'",
    "'\"-\"'",
]
ALB_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "ELSE concat_ws(' ', " + ", ".join(_ALB_FIELDS) + ") END"
)

# CloudFront line (33 tab-separated fields per patterns.CLOUDFRONT)
_CF_FIELDS = [
    "'2024-01-01'",
    "'00:00:01'",
    f"concat('LAX', {_n('event_id % 3')})",
    _n("CAST(FLOOR(value * 100) AS BIGINT)"),
    f"concat('192.0.2.', {_n('user_id % 200')})",
    "'GET'",
    f"concat('d', {_n('event_id % 5')}, '.cloudfront.net')",
    f"concat('/', event_type, '/', {_n('event_id')})",
    _n("200 + (event_id % 4) * 100"),
    "'-'",
    f"concat('ua/', {_n('event_id % 7')})",
    "'-'",
    "'-'",
    "'Hit'",
    f"concat('req', {_n('event_id')})",
    "'example.com'",
    "'https'",
    _n("100 + event_id % 900"),
    "'0.001'",
    "'-'",
    "'TLSv1.2'",
    "'ECDHE-RSA-AES128-GCM-SHA256'",
    "'Hit'",
    "'HTTP/2.0'",
    "'-'",
    "'-'",
    _n("10000 + event_id % 5000"),
    "'0.001'",
    "'Hit'",
    "'text/html'",
    _n("CAST(FLOOR(value * 100) AS BIGINT)"),
    "'-'",
    "'-'",
]
CF_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "ELSE concat_ws(chr(9), " + ", ".join(_CF_FIELDS) + ") END"
)


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, round-robin repartitioned: the sf-dir table is ONE
    parquet row group (a single input split), so per-doc-heavy operators
    (shingling, hashing) would otherwise run on one core. At 100 TB the
    table arrives as many splits and this shuffle disappears."""
    return _load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _event_lines(spark: SparkSession, sf_dir: str, line_sql: str) -> DataFrame:
    """events -> (source, line_no, raw [, event_id]) lines DataFrame.

    The sf-dir events table is ONE parquet file with one row group, so a
    plain read is a single input split and the decode UDF would run on one
    core. Ingest round-robin repartition spreads the batch across the
    cluster before the (CPU-heavy) decode — at 100 TB the source arrives
    as many splits and this becomes a no-op-sized shuffle of raw lines.
    """
    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ev.select(
        F.col("event_id"),
        F.expr(SRC).alias("source"),
        F.expr(LINE_NO).alias("line_no"),
        F.expr(line_sql).alias("raw"),
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_parse_clf_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex decode, structured surface: union-schema string columns."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    out = extract_fields(lines, "apache_clf", passthrough=["event_id"])
    return out.select(
        "event_id", "pattern_id", "remote_host", "remote_user", "method",
        "request_uri", "protocol", "status", "size", "user_agent",
    )


def _q_parse_s3_fallbacks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins cascade over the 5 S3 truncation patterns."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, S3_LINE)
    out = extract_fields(lines, "s3", passthrough=["event_id"])
    return out.select(
        "event_id", "pattern_id", "bucket", "http_status", "bytes_sent",
        "version_id", "host_header", "tls_version",
    )


def _q_parse_ltsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTSV dynamic decode: ordered (pos, label, value) triples."""
    from access_log_parser_spark import extract_ltsv

    lines = _event_lines(spark, sf_dir, LTSV_LINE)
    out = extract_ltsv(lines, passthrough=["event_id"])
    return out.select(
        "event_id",
        F.posexplode(F.arrays_zip(F.col("labels"), F.col("values"))).alias("pos", "lv"),
    ).select(
        "event_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("lv.labels").alias("label"),
        F.col("lv.values").alias("value"),
    )


VHOST_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "ELSE concat('vh-', CAST(event_id % 9 AS STRING), '.example.com ', "
    + CLF_LINE.replace(
        "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING))\nELSE concat(",
        "concat(",
    ).replace("\nEND", "") + ") END"
)

# NLB line: 22 space-separated fields (patterns.NLB)
_NLB_FIELDS = [
    "'tls'", "'2.0'", "'2024-01-01T00:00:00'",
    f"concat('net/lb', {_n('event_id % 3')}, '/abc')",
    f"concat('listener', {_n('event_id % 4')})",
    f"concat('192.0.2.', {_n('user_id % 200')}, ':', {_n('1024 + event_id % 1000')})",
    f"concat('10.0.1.', {_n('event_id % 50')}, ':443')",
    f"concat('0.', {_n('event_id % 10')})",
    "'0.01'",
    _n("100 + event_id % 900"),
    _n("CAST(FLOOR(value * 100) AS BIGINT)"),
    "'-'", "'arn:cert'",
    f"concat('ser', {_n('event_id % 7')})",
    "'ECDHE-RSA-AES128-GCM-SHA256'", "'TLSv1.2'", "'secp256r1'",
    f"concat('example-', {_n('event_id % 11')}, '.com')",
    "'h2'", "'h2'", "'h2,http/1.1'", "'2024-01-01T00:00:00'",
]
NLB_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "ELSE concat_ws(' ', " + ", ".join(_NLB_FIELDS) + ") END"
)

# CLB line: 17-field variant (pattern 0) for even ids, 14-field (pattern 1)
# for odd — exercises the 2-pattern fallback cascade
_CLB_HEAD_FIELDS = [
    "'2024-01-01T00:00:00Z'",
    f"concat('my-lb', {_n('event_id % 3')})",
    f"concat('192.0.2.', {_n('user_id % 200')}, ':', {_n('1024 + event_id % 1000')})",
    f"concat('10.0.1.', {_n('event_id % 50')}, ':80')",
    "'0.00004'", "'0.001'", "'0.00003'",
    _n("200 + (event_id % 4) * 100"),
    "'200'",
    _n("100 + event_id % 900"),
    _n("CAST(FLOOR(value * 100) AS BIGINT)"),
    f"""concat('"GET /', event_type, '/', {_n('event_id')}, ' HTTP/1.1"')""",
]
_CLB_TAIL = [
    f"""concat('"ua/', {_n('event_id % 7')}, '"')""",
    "'ECDHE-RSA-AES128-GCM-SHA256'",
    "'TLSv1.2'",
]
CLB_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "WHEN event_id % 2 = 0 THEN concat_ws(' ', "
    + ", ".join(_CLB_HEAD_FIELDS + _CLB_TAIL)
    + ") ELSE concat_ws(' ', " + ", ".join(_CLB_HEAD_FIELDS) + ") END"
)


def _q_parse_clf_vhost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache CLF + virtual host preset (parser_regex.go:125-142)."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, VHOST_LINE)
    out = extract_fields(
        lines, "apache_clf_vhost", passthrough=["event_id"],
        fields=["virtual_host", "remote_host", "status", "request_uri"],
    )
    return out.select(
        "event_id", "pattern_id", "virtual_host", "remote_host", "status",
        "request_uri",
    )


def _q_parse_nlb_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NLB preset (parser_regex.go:204-218): 22-field TLS listener log."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, NLB_LINE)
    out = extract_fields(
        lines, "nlb", passthrough=["event_id"],
        fields=["elb", "received_bytes", "sent_bytes", "domain_name",
                "chosen_cert_serial"],
    )
    return out.select(
        "event_id", "pattern_id", "elb", "received_bytes", "sent_bytes",
        "domain_name", "chosen_cert_serial",
    )


def _q_parse_clb_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLB preset (parser_regex.go:222-237): 17/14-field two-pattern
    fallback — first-match-wins across the cascade."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLB_LINE)
    out = extract_fields(
        lines, "clb", passthrough=["event_id"],
        fields=["elb", "elb_status_code", "sent_bytes", "request_uri",
                "user_agent", "ssl_protocol"],
    )
    return out.select(
        "event_id", "pattern_id", "elb", "elb_status_code", "sent_bytes",
        "request_uri", "user_agent", "ssl_protocol",
    )


def _q_parse_alb_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALB preset (patterns.ALB <- parser_regex.go:186-200): 31-field
    space-separated decode with quoted sub-fields."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, ALB_LINE)
    out = extract_fields(
        lines, "alb", passthrough=["event_id"],
        fields=["elb_status_code", "sent_bytes", "request_uri",
                "domain_name", "target_status_code_list"],
    )
    return out.select(
        "event_id", "pattern_id", "elb_status_code", "sent_bytes",
        "request_uri", "domain_name", "target_status_code_list",
    )


def _q_parse_cloudfront_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CloudFront preset (patterns.CLOUDFRONT <- parser_regex.go:168-182):
    33-field tab-separated decode."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CF_LINE)
    out = extract_fields(
        lines, "cloudfront", passthrough=["event_id"],
        fields=["x_edge_location", "sc_status", "cs_uri_stem",
                "sc_bytes", "cs_protocol_version"],
    )
    return out.select(
        "event_id", "pattern_id", "x_edge_location", "sc_status",
        "cs_uri_stem", "sc_bytes", "cs_protocol_version",
    )


def _q_serialize_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyValuePairLineHandler output (handler.go:59-75): k="v" space-joined."""
    from access_log_parser_spark import Option, parse_routed

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.col("event_id").cast("string").alias("source"),
        F.lit(1).cast("long").alias("line_no"),
        F.expr(LTSV_LINE).alias("raw"),
    )
    routed = parse_routed(lines, "ltsv", Option(line_handler="kv"))
    return routed.select("source", "out_line")


def _q_serialize_ltsv_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTSVLineHandler output (handler.go:78-96): k:v tab-joined."""
    from access_log_parser_spark import Option, parse_routed

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.col("event_id").cast("string").alias("source"),
        F.lit(1).cast("long").alias("line_no"),
        F.expr(LTSV_LINE).alias("raw"),
    )
    routed = parse_routed(lines, "ltsv", Option(line_handler="ltsv"))
    return routed.select("source", "out_line")


def _q_serialize_pretty_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrettyJSONLineHandler output (handler.go:37-56): indented
    multi-line objects, still one record per input line."""
    from access_log_parser_spark import Option, parse_routed

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.col("event_id").cast("string").alias("source"),
        F.lit(1).cast("long").alias("line_no"),
        F.expr(LTSV_LINE).alias("raw"),
    )
    routed = parse_routed(lines, "ltsv", Option(line_handler="pretty_json"))
    return routed.select("source", "out_line")


def _custom_pipe_handler(labels, values, is_first=False):
    """Custom LineHandler injection (reference: any handler.LineHandler
    func can be set on Parser options — example_test.go custom handler):
    label=value pairs joined by '|'."""
    n = len(labels)
    return "|".join(f"{labels[i]}={v}" for i, v in enumerate(values) if i < n)


def _q_serialize_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-injected Python LineHandler through the full engine path."""
    from access_log_parser_spark import Option, parse_routed

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.col("event_id").cast("string").alias("source"),
        F.lit(1).cast("long").alias("line_no"),
        F.expr(LTSV_LINE).alias("raw"),
    )
    routed = parse_routed(lines, "ltsv", Option(line_handler=_custom_pipe_handler))
    return routed.select("source", "out_line")


def _q_serialize_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSVLineHandler output (handler.go:99-123): values tab-joined with a
    header line on the first matched row per source (every row here: each
    line is its own source)."""
    from access_log_parser_spark import Option, parse_routed

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.col("event_id").cast("string").alias("source"),
        F.lit(1).cast("long").alias("line_no"),
        F.expr(LTSV_LINE).alias("raw"),
    )
    routed = parse_routed(lines, "ltsv", Option(line_handler="tsv"))
    return routed.select("source", "out_line")


def _q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Option pipeline: skip-lines + filter DSL + routing; per-sink
    aggregate counts (the north_rule's per-sink equality check)."""
    from access_log_parser_spark import Option, counters_by_sink, parse_routed

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    routed = parse_routed(
        lines.select("source", "line_no", "raw"),
        "apache_clf",
        Option(skip_lines=[1], filters=["status == 200"]),
    )
    return counters_by_sink(routed).select(
        "status", "pattern_id", F.col("rows").cast("bigint").alias("n_rows")
    )


def _q_filter_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter DSL compiled to a Catalyst predicate (JVM path)."""
    from access_log_parser_spark import extract_fields, filters_to_column

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(lines, "apache_clf", passthrough=["event_id"])
    pred = filters_to_column(["size >= 50", "status < 400"], fields.columns)
    return (
        fields.filter(F.col("pattern_id") >= 0)
        .filter(pred)
        .select("event_id", "status", "size")
    )


def _q_serialize_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact NDJSON serialization of LTSV-decoded lines."""
    from access_log_parser_spark import parse_routed

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.col("event_id").cast("string").alias("source"),
        F.lit(1).cast("long").alias("line_no"),
        F.expr(LTSV_LINE).alias("raw"),
    )
    routed = parse_routed(lines, "ltsv")
    return routed.select("source", "out_line")


def _q_errors_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unmatched route -> errors side table (entry, line_number, line)."""
    from access_log_parser_spark import UNMATCHED, parse_routed

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    routed = parse_routed(lines.select("source", "line_no", "raw"), "apache_clf")
    return routed.filter(F.col("status") == UNMATCHED).select(
        F.col("source").alias("entry"),
        F.col("line_no").alias("line_number"),
        F.col("raw").alias("line"),
    )


def _q_enrich_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash-join enrichment of parsed rows with a dim table."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.enrich import broadcast_enrich

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(lines, "apache_clf", passthrough=["event_id"]).filter(
        F.col("pattern_id") >= 0
    )
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = broadcast_enrich(
        fields.withColumn("n_nationkey", F.col("event_id") % 25),
        nation,
        on="n_nationkey",
    )
    return enriched.select("event_id", "remote_host", "n_name")


def _q_agg_by_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pattern aggregate over the S3 fallback corpus."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, S3_LINE)
    out = extract_fields(lines, "s3", passthrough=["event_id"])
    return out.groupBy("pattern_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


def _q_counters_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Result counters (zip-entry merge shape)."""
    from access_log_parser_spark import counters_by_source, parse_routed

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    routed = parse_routed(lines.select("source", "line_no", "raw"), "apache_clf")
    c = counters_by_source(routed)
    return c.select(
        "source",
        F.col("total").cast("bigint").alias("total"),
        F.col("matched").cast("bigint").alias("matched"),
        F.col("unmatched").cast("bigint").alias("unmatched"),
        F.col("excluded").cast("bigint").alias("excluded"),
        F.col("skipped").cast("bigint").alias("skipped"),
    )


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregation (cent-exact integer arithmetic)."""
    li = _load(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100).cast("bigint")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_c"),
            F.sum(cents("l_extendedprice")).alias("sum_base_price_c"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
            ).alias("sum_disc_price_c"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


def _q_tpch_q3_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (shuffle-heavy shape)."""
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("l_orderkey")
        .agg(F.sum(rev).alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def _q_tpch_q6_selective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective filter + global aggregate (pushdown showcase)."""
    li = _load(spark, sf_dir, "lineitem")
    rev = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).alias("revenue_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


def _q_tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table join chain (region-nation-customer-orders-lineitem) with
    broadcast dims and a grouped integer-exact revenue."""
    r = _load(spark, sf_dir, "region")
    n = _load(spark, sf_dir, "nation")
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(rev).alias("revenue_c"))
    )


def _q_tpch_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) + grouped count — TPC-H q4 shape: orders
    having at least one late lineitem, counted per orderpriority."""
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") >= "1996-01-01").select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


def _q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer
    (l_returnflag = 'R'), 4-way join, top 20 with a custkey tie-break.
    Cents-integer revenue keeps the SUM exact across engines."""
    from pyspark.sql import Window

    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    nation = _load(spark, sf_dir, "nation")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(rev).alias("revenue_c")
    )
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("c_custkey").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("c_custkey", "c_name", "n_name", "revenue_c", "rank")
    )


def _q_cumulative_revenue_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (ties share the frame — semantically distinct
    from ROWS): per return flag, the cumulative cents revenue over ship
    dates; every line item on the same date sees the same running
    total."""
    from pyspark.sql import Window

    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_shipdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_shipdate").cast("string").alias("ship_date"),
        F.sum(rev).over(w).alias("cum_revenue_c"),
    )


def _q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (two-phase expand-dedup): exact distinct users
    + total events per event type."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def _q_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-join star query with broadcast dims."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    n = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


def _q_anti_join_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti-join reconciliation (SURVEY.md §2.3): all lines minus the
    matched set = exactly the unmatched rows."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(lines, "apache_clf", passthrough=["event_id"])
    matched_ids = fields.filter(F.col("pattern_id") >= 0).select("event_id")
    return (
        lines.join(matched_ids, on="event_id", how="left_anti")
        .select("event_id", "raw")
    )


def _q_window_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function over parsed rows: per-source running count of
    matched lines by line number (the distributed generalization of the
    reference's isFirst/line-ordering logic, SURVEY.md §2.5)."""
    from pyspark.sql import Window

    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    matched = extract_fields(
        lines, "apache_clf", passthrough=["event_id", "source", "line_no"]
    ).filter(F.col("pattern_id") >= 0)
    w = Window.partitionBy("source").orderBy("line_no")
    return matched.select(
        "event_id",
        "source",
        "line_no",
        F.row_number().over(w).cast("bigint").alias("running_matched"),
    )


def _q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over the routed corpus: per-(status, pattern_id),
    per-status subtotals and grand total in one pass."""
    from access_log_parser_spark import parse_routed

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    routed = parse_routed(lines.select("source", "line_no", "raw"), "apache_clf")
    return routed.rollup("status", "pattern_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


def _q_event_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-hour aggregation over the events stream table
    (batch twin of streaming.windowed_status_counts)."""
    ev = _load(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH")
    return ev.groupBy(
        hour.alias("hour"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
    )


def _q_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted two-phase count per source (SURVEY.md §4 salting):
    must equal a plain groupBy count."""
    from access_log_parser_spark.enrich import two_phase_count

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    out = two_phase_count(lines, "source", buckets=8)
    return out.select("source", F.col("count").cast("bigint").alias("n_lines"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup fingerprints (md5 of normalized text) + group sizes.
    The shared corpus has no duplicate docs, so groups are size 1 and the
    check verifies fingerprint equality engine-to-engine."""
    from access_log_parser_spark.operators.text_quality import fingerprint

    docs = _load(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fp")


def _q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=16, md5-based, 2^61-1 modulus): first/last
    signature components per doc — the LSH input contract. Computed
    fully JVM-side with array HOFs per row (array_min over the permuted
    shingle-hash array): ZERO shuffles, bit-identical to the explode+agg
    path and the Python engine (tests pin all three)."""
    from access_log_parser_spark.operators.dedup import minhash_signatures_hof

    docs = _docs_par(spark, sf_dir)
    sigs = minhash_signatures_hof(docs)
    return sigs.select(
        "doc_id",
        F.col("sig")[0].alias("mh_0"),
        F.col("sig")[7].alias("mh_7"),
        F.col("sig")[15].alias("mh_15"),
    )


def _q_dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash+LSH candidate pairs over a corpus with injected
    exact duplicates (doc_id + 100000): every doc must pair with its copy
    (identical signatures agree on all bands), plus any natural band
    collisions. Full scale path: JVM signatures -> banded self-join."""
    from access_log_parser_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_hof,
    )

    base = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    dup = base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    sigs = minhash_signatures_hof(base.unionAll(dup))
    return lsh_candidate_pairs(sigs).select("id_a", "id_b")


def _q_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash dedup end-to-end WITH the exact-verify step:
    HOF signatures -> banded candidates -> exact Jaccard (>= 0.5) on the
    candidate set only. Injected exact copies must all survive with
    jaccard 1.0; incidental band collisions below threshold are
    dropped."""
    from access_log_parser_spark.operators.dedup import lsh_verified_pairs

    base = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    dup = base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    return lsh_verified_pairs(base.unionAll(dup), threshold=0.5).select(
        "id_a", "id_b", "jaccard"
    )


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution end-to-end: corpus with TWO injected
    copies per doc -> JVM MinHash -> LSH candidate pairs -> connected
    components (iterative min-label propagation; DuckDB twin = recursive
    CTE transitive closure). Every component must resolve to cluster_id =
    the original doc_id."""
    from access_log_parser_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures_hof,
    )

    base = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )
    corpus = base.unionAll(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).unionAll(base.select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
    # distinct=False: union-find dedups repeated edges itself, so the
    # banding pipeline skips its final dedup shuffle
    pairs = lsh_candidate_pairs(minhash_signatures_hof(corpus), distinct=False)
    return connected_components(corpus.select("doc_id"), pairs)


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs over an inverted shingle index,
    restricted to doc_id < 200 to bound the oracle's pairwise work."""
    from access_log_parser_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(docs, threshold=0.2, n=3)


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (md5 token hashes, sign-sum bits)."""
    from access_log_parser_spark.operators.dedup import simhash

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 200)
    return simhash(docs)


def _q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from access_log_parser_spark.operators.text_quality import token_count

    return token_count(_docs_par(spark, sf_dir))


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from access_log_parser_spark.operators.text_quality import quality_score

    return quality_score(_docs_par(spark, sf_dir))


def _q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from access_log_parser_spark.operators.text_quality import lang_id

    return lang_id(_docs_par(spark, sf_dir))


def _q_text_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (the n-gram-heuristic variant of
    text_lang_id; same argmax/tie-break, different feature space)."""
    from access_log_parser_spark.operators.text_quality import lang_id_ngram

    return lang_id_ngram(_docs_par(spark, sf_dir))


def _q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for 5 query vectors."""
    from access_log_parser_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5).select(
        "query_id", "neighbor_id", "rank"
    )


def _q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label buckets (0.3
    threshold: the synthetic embeddings have no true near-dups, so this
    exercises the top tail of the cosine distribution)."""
    from access_log_parser_spark.operators.dedup import embedding_near_dup

    emb = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return embedding_near_dup(emb, threshold=0.3, bucket_col="label").select(
        "id_a", "id_b"
    )


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization of the events stream: a new session starts after a
    >30-minute gap per user (LAG + conditional cumsum — the standard
    log-analytics window composition the reference cannot express)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic is timezone-agnostic (ts is TIMESTAMP_NTZ)
    prev = F.lag(F.col("ts")).over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_no",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


def _q_topk_uris(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deterministic top-10 request URIs among matched CLF lines."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(lines, "apache_clf").filter(F.col("pattern_id") >= 0)
    return (
        fields.groupBy("request_uri")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
        .orderBy(F.col("hits").desc(), F.col("request_uri").asc())
        .limit(10)
    )


def _q_bot_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot detection over the parsed CLF corpus
    (operators/botdetect.bot_signals): decode -> per-client aggregate.
    The synthetic UA is remapped by event_id %% 7 so two of seven
    request classes self-identify (Googlebot, curl); URI diversity and
    4xx/5xx appetite come from the corpus's own shapes. The oracle
    replays the matched-line field arithmetic and the exact count
    thresholds."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.botdetect import bot_signals

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(
        lines, "apache_clf", passthrough=["event_id"]
    ).filter(F.col("pattern_id") >= 0)
    ua = (
        F.when(
            F.col("event_id") % 7 == 0,
            F.lit("Googlebot/2.1 (+http://www.google.com/bot.html)"),
        )
        .when(F.col("event_id") % 7 == 1, F.lit("curl/8.0.1"))
        .otherwise(
            F.concat(
                F.lit("Mozilla/5.0 ua"),
                (F.col("event_id") % 7).cast("string"),
            )
        )
    )
    reqs = fields.select(
        "remote_host", "request_uri", "status", ua.alias("user_agent")
    )
    return bot_signals(reqs)


def _q_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL cluster dedup (webtext.canonical_pick): doc_id %% 3
    declares no canonical / a shared per-decade canonical / an EMPTY
    canonical (both non-declarations must fall back to the page's own
    URL); quality (13*doc_id)%%50 picks the representative. Oracle
    replays the key fallback, rank and cluster-size windows."""
    from access_log_parser_spark.operators.webtext import canonical_pick

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 400)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    pages = docs.select(
        F.concat(F.lit("https://ex/p/"), k).alias("url"),
        F.when(
            m == 1,
            F.concat(
                F.lit("https://canon/"),
                F.floor(F.col("doc_id") / 10).cast("string"),
            ),
        )
        .when(m == 2, F.lit(""))
        .alias("canonical_url"),
        ((F.col("doc_id") * 13) % 50).cast("double").alias("quality"),
    )
    return canonical_pick(pages)


def _q_hreflang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate extraction (webtext.hreflang_alternates):
    doc_id %% 3 plants two lang-first alternates / one href-first / no
    alternates; BCP 47 case-insensitivity pinned by an uppercase
    region. Oracle is closed-form per variant."""
    from access_log_parser_spark.operators.webtext import (
        hreflang_alternates,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 400)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    h = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<html><head><link rel="alternate" hreflang="en" '
                      'href="https://ex/en/'), k,
                F.lit('"><link rel="alternate" hreflang="fr-FR" '
                      'href="https://ex/fr/'), k,
                F.lit('"></head><body></body></html>'),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<html><head><link rel="alternate" '
                      'href="https://ex/de/'), k,
                F.lit('" hreflang="de"></head><body></body></html>'),
            ),
        )
        .otherwise(F.lit("<html><body>no alternates</body></html>"))
    )
    return hreflang_alternates(
        docs.select("doc_id", F.encode(h, "utf-8").alias("html"))
    )


def _q_idn_homograph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homograph/lookalike-host detection (webtext.idn_homograph_signals):
    doc_id %% 5 visits a leet paypal clone / a www-prefixed g00gle clone
    / the GENUINE paypal.com (must not self-flag) / a punycode label /
    a benign host. Oracle replays the confusable fold and the
    levenshtein argmin with the (distance, brand) tiebreak."""
    from access_log_parser_spark.operators.webtext import (
        idn_homograph_signals,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    url = F.concat(
        F.lit("https://"),
        F.when(m == 0, F.lit("paypa1.com"))
        .when(m == 1, F.lit("www.g00gle.net"))
        .when(m == 2, F.lit("paypal.com"))
        .when(m == 3, F.lit("xn--pple-43d.com"))
        .otherwise(F.lit("news.example.org")),
        F.lit("/p/"), k,
    )
    return idn_homograph_signals(docs.select("doc_id", url.alias("url")))


def _q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation (evaluation.ndcg_at_k): 5 synthetic
    queries over docs 0-199 with score (7*doc_id)%%100 and graded
    rel doc_id%%4; NDCG@10 with both tie-breaks pinned on doc_id. The
    oracle replays both window ranks and the exponential-gain sums."""
    from access_log_parser_spark.operators.evaluation import ndcg_at_k

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 200)
    cand = docs.select(
        F.concat(F.lit("q"), (F.col("doc_id") % 5).cast("string"))
        .alias("query_id"),
        "doc_id",
        ((F.col("doc_id") * 7) % 100).cast("double").alias("score"),
        (F.col("doc_id") % 4).alias("rel"),
    )
    return ndcg_at_k(cand, k=10)


def _q_zscore_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch z-score spike detection (streaming/anomaly.zscore_spikes):
    events bucketed per (user-group, hour) with ~40%% of rows planted
    into hour 0 — the detector must flag exactly those buckets; the
    oracle replays the exact-integer moment arithmetic."""
    from access_log_parser_spark.streaming.anomaly import zscore_spikes

    ev = _load(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(F.lit("u"), (F.col("user_id") % 10).cast("string"))
        .alias("grp"),
        F.when(F.col("event_id") % 50 < 20, F.lit(0))
        .otherwise(F.col("event_id") % 24)
        .cast("long")
        .alias("hour"),
    )
    return zscore_spikes(keyed, key_col="grp", bucket_col="hour")


def _q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew diagnosis (enrich.key_skew_profile): a planted
    hot key holds ~half the events ('hot' when user_id %% 100 < 50,
    else 50 cold keys) — the profile must surface it at rank 1 with
    share ~0.5 and imbalance ~25x; the oracle replays counts, the
    1-row totals and the (n desc, key) top-k."""
    from access_log_parser_spark.enrich import key_skew_profile

    ev = _load(spark, sf_dir, "events")
    m = F.col("user_id") % 100
    keyed = ev.select(
        F.when(m < 50, F.lit("hot"))
        .otherwise(F.concat(F.lit("h"), m.cast("string")))
        .alias("host")
    )
    return key_skew_profile(keyed, "host", topk=5)


def _q_search_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-referrer term report (operators/referrers.search_referrers)
    over a parsed combined-log corpus whose Referer field carries five
    variants (google, bing with case-folding, an EMPTY q that must
    drop, a generic ?query= carrier -> 'other', and the CLF '-'): the
    classic top-search-terms log report, decode -> extract -> one
    keyed count. Oracle is closed-form per variant."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.referrers import (
        search_referrers,
    )

    m = "event_id % 5"
    t = "CAST(event_id % 9 AS STRING)"
    ref = (
        f"CASE WHEN {m} = 0 THEN concat("
        f"'https://www.google.com/search?q=term+', {t})"
        f" WHEN {m} = 1 THEN concat("
        f"'https://www.bing.com/search?q=Term+', {t}, '&form=QB')"
        f" WHEN {m} = 2 THEN 'https://duckduckgo.com/?q='"
        f" WHEN {m} = 3 THEN 'https://internal.example/page?query=x%20y'"
        f" ELSE '-' END"
    )
    line = (
        "concat('192.0.2.', CAST(user_id % 200 AS STRING), "
        "' - user', CAST(user_id % 50 AS STRING), "
        "' [16/Feb/2019:11:23:45 +0000] \"GET /', event_type, '/', "
        "CAST(event_id AS STRING), ' HTTP/1.1\" 200 123 \"', "
        f"{ref}, '\" \"ua\"')"
    )
    lines = _event_lines(spark, sf_dir, line)
    fields = extract_fields(
        lines, "apache_clf", fields=["referer"]
    ).filter(F.col("pattern_id") >= 0)
    return search_referrers(fields)


def _q_topk_uris_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP top-k: top-3 request URIs within each source via a
    window rank (deterministic tie-break), the grouped twin of the global
    TakeOrdered in topk_uris. At scale: one shuffle on source, rank
    inside partitions, no global sort."""
    from pyspark.sql import Window

    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(
        lines, "apache_clf", passthrough=["source"], fields=["request_uri"]
    ).filter(F.col("pattern_id") >= 0)
    counts = fields.groupBy("source", "request_uri").agg(
        F.count(F.lit(1)).cast("bigint").alias("hits")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("hits").desc(), F.col("request_uri").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "request_uri", "hits", F.col("rk").cast("int").alias("rk"))
    )


def _q_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed response-size histogram over matched CLF lines."""
    from access_log_parser_spark import extract_fields

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(lines, "apache_clf").filter(F.col("pattern_id") >= 0)
    bucket = F.floor(F.log2(F.col("size").cast("double") + 1)).cast("int")
    return fields.groupBy(bucket.alias("size_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )


def _q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data curation: quality gate -> language gate ->
    exact-dedup keep-first -> per-source kept/dropped stats. The shape of
    a real corpus-cleaning job, end-to-end in one plan. The per-row
    signals (quality, lang, fingerprint) compose as column PROJECTIONS —
    the only exchanges left are the dedup window and the final agg
    (round-2 VERDICT item #2: no doc_id join-backs)."""
    from pyspark.sql import Window

    from access_log_parser_spark.operators.text_quality import (
        fingerprint_col,
        pred_lang_col,
        quality_score_col,
    )

    docs = _load(spark, sf_dir, "documents")
    gated = (
        docs.select(
            "doc_id",
            "source",
            quality_score_col(F.col("text")).alias("quality"),
            pred_lang_col(F.col("text")).alias("pred_lang"),
            fingerprint_col(F.col("text")).alias("fp"),
        )
        .filter((F.col("quality") >= 0.5) & (F.col("pred_lang") == "en"))
    )
    keep = F.row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")
    ) == 1
    kept = gated.withColumn("_keep", keep).filter(F.col("_keep"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )


def _q_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-generation curation composite built from the webtext
    stages, end-to-end in ONE plan: Gopher repetition gate
    (dup_word_frac <= 0.55) -> benchmark decontamination (drop docs
    sharing >= 2 distinct 3-grams with the doc_id<10 'benchmark') ->
    per-language kept-doc and token budget."""
    from access_log_parser_spark.operators.webtext import (
        contamination_flags,
        dup_word_frac_col,
        rep_token_count_col,
    )

    docs = _docs_par(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") >= 10)
    bench = docs.filter(F.col("doc_id") < 10)
    # per-row repetition signals compose as a PROJECTION (no doc_id
    # join-back); contamination stays a join — it is genuinely
    # corpus-vs-benchmark (broadcast distinct benchmark shingles)
    cont = contamination_flags(corpus, bench, n=3)
    gated = (
        corpus.select(
            "doc_id",
            "lang",
            rep_token_count_col(F.col("text")).alias("n_tokens"),
            dup_word_frac_col(F.col("text")).alias("dup_word_frac"),
        )
        .filter(F.col("dup_word_frac") <= 0.55)
        .join(cont, "doc_id", "left")
        .filter(F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) < 2)
    )
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def _q_vocab_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 tokens by frequency (map-side partial agg ->
    one token-keyed shuffle -> TakeOrdered)."""
    from access_log_parser_spark.operators.text_quality import vocab_topk

    return vocab_topk(_load(spark, sf_dir, "documents"), k=20).select(
        "token", F.col("freq").cast("bigint").alias("freq")
    )


def _q_idf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token document frequency + smoothed IDF (distinct-per-doc
    explode, broadcast corpus size)."""
    from access_log_parser_spark.operators.text_quality import doc_frequency_idf

    return doc_frequency_idf(_load(spark, sf_dir, "documents"), min_df=5)


def _q_sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed 1/20 sample: stable under
    repartitioning and engine-portable (md5 bucket, no RNG)."""
    from access_log_parser_spark.operators.sampling import hash_mod_sample

    docs = _load(spark, sf_dir, "documents")
    return hash_mod_sample(docs, "doc_id", buckets=20).select("doc_id", "source")


def _q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-source stratified sample (md5-ordered window)."""
    from access_log_parser_spark.operators.sampling import stratified_sample

    docs = _load(spark, sf_dir, "documents")
    return stratified_sample(docs, "source", "doc_id", 5).select("source", "doc_id")


def _q_pack_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (streaming bin-fill strategy): documents fill
    ~5000-char packs within content-addressed shards — the training-
    example assembly step of a data pipeline. Pure window cumsum; the
    exact greedy variant is applyInPandas-per-shard (test_packing)."""
    from access_log_parser_spark.operators.packing import pack_streaming
    from access_log_parser_spark.operators.sampling import hash_bucket

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", hash_bucket(F.col("doc_id"), 8).alias("shard"), "n_chars"
    )
    out = pack_streaming(docs, budget=5000, shard_col="shard", token_col="n_chars")
    return out.select("doc_id", "shard", "pack_id")


def _q_train_holdout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed train/holdout split: disjoint + exhaustive by
    construction; per-split doc counts."""
    from access_log_parser_spark.operators.sampling import split_train_holdout

    docs = _load(spark, sf_dir, "documents")
    train, holdout = split_train_holdout(docs, "doc_id")
    tagged = train.select(F.lit("train").alias("split"), "doc_id").unionAll(
        holdout.select(F.lit("holdout").alias("split"), "doc_id")
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def _q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events ``props`` column (absent from
    the reference — SURVEY §2.6; the graft's semi-structured path):
    extract $.k, bucket it, aggregate."""
    ev = _load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select((k % 10).alias("k_bucket"), k.alias("k")).groupBy(
        "k_bucket"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def _q_grok_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grok-authored format (%{MACRO:name} -> named-group regex) through
    the standard engine (SURVEY §2.8 authoring surface): a syslog-ish
    line grokked into (level, ip, status, msg)."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.grok import grok_to_regex

    line_sql = """concat(
      CASE WHEN event_id % 4 = 0 THEN 'ERROR' ELSE 'INFO' END,
      ' 192.0.2.', CAST(user_id % 200 AS STRING),
      ' status=', CAST(200 + (event_id % 4) * 100 AS STRING),
      ' ', event_type, '-', CAST(event_id AS STRING))""".strip()
    lines = _event_lines(spark, sf_dir, line_sql)
    pattern = grok_to_regex(
        "%{LOGLEVEL:level} %{IPV4:ip} status=%{INT:status} %{GREEDYDATA:msg}"
    )
    out = extract_fields(lines, [pattern], passthrough=["event_id"])
    return out.select("event_id", "pattern_id", "level", "ip", "status", "msg")


def _q_funnel_depth_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic log-analytics funnel (view -> click -> purchase), ordered
    by event_id per user: users counted at their deepest strictly-ordered
    stage, via the N-STAGE operator (operators/funnel.py — one
    conditional min-aggregate per stage chained by inequality, no window
    over the full stream; generalizes past the hardcoded 3 stages that
    round-2 VERDICT item #9 flagged)."""
    from access_log_parser_spark.operators.funnel import funnel_depth_counts

    ev = (
        _load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)  # prefix slice: all 4 depths occur
        .select("user_id", "event_id", "event_type")
    )
    return funnel_depth_counts(ev, ["view", "click", "purchase"])


def _q_length_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact order statistics with a deterministic, engine-
    portable definition: 'lower median' = value at 1-based rank
    floor((n-1)/2)+1 ordered by (n_chars, doc_id). Avoids interpolation
    (quantile_cont/percentile float semantics differ across engines)."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1
    ).select("source", F.col("n_chars").alias("median_chars"))
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    return stats.join(med, "source")


def _q_shard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment: content-addressed md5 bucket of doc_id
    into 8 shards; per-shard doc counts (the write-side last mile of a
    curation pipeline — sinks.write_training_shards uses this column as
    the partitionBy key)."""
    from access_log_parser_spark.operators.sampling import hash_bucket

    docs = _load(spark, sf_dir, "documents")
    return (
        docs.withColumn("shard", hash_bucket(F.col("doc_id"), 8))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def _q_dedup_replay_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.dedup_replays_within_watermark: an
    at-least-once shipper redelivers every event; dropDuplicates on the
    delivery key restores exactly-once. (The streaming variant with
    bounded watermark state is tested in test_streaming.)"""
    ev = _load(spark, sf_dir, "events").select("event_id", "event_type")
    replayed = ev.unionAll(ev)
    return replayed.dropDuplicates(["event_id"]).select("event_id", "event_type")


def _q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (bytes + digest) over text payload cast to
    binary — the JVM-side pre-filter of the media decode path."""
    from access_log_parser_spark.operators.multimodal import binary_metadata

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return binary_metadata(docs, "doc_id", "payload")


def _q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with synthesized PII appended (the
    corpus itself is clean): emails / IPv4s / intl phone numbers, counts
    from the pre-redaction text. Pure JVM regexp chain."""
    from access_log_parser_spark.operators.webtext import pii_redact

    docs = _docs_par(spark, sf_dir)
    pii = F.expr(
        "CASE CAST(doc_id % 3 AS INT) "
        "WHEN 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com now') "
        "WHEN 1 THEN concat(' from 192.0.2.', CAST(doc_id % 256 AS STRING), ' today') "
        "ELSE concat(' call +49151', CAST(1000000 + doc_id AS STRING)) END"
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), pii).alias("text")
    )
    return pii_redact(seeded)


def _q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition ratios over the real document texts —
    within-row HOFs only (no explode, no shuffle). ``max_tokens=10_000``
    bounds the O(distinct*n) top-word scan on pathological giant docs
    (sf testdata docs are far shorter, so results are unchanged; the cap
    is the 100-TB safety the operator was built with — VERDICT r02 #2)."""
    from access_log_parser_spark.operators.webtext import repetition_signals

    return repetition_signals(_docs_par(spark, sf_dir), max_tokens=10_000)


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup: 50 synthetic pages x 4
    paragraphs, where pages 0-49 draw paragraphs from docs 0-99 twice
    over (para source = doc_id % 100), so every paragraph re-occurrence
    must be dropped at all but its first (page_id, pos) position."""
    from access_log_parser_spark.operators.webtext import paragraph_dedup

    d = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") % 50).alias("page_id"),
        (F.col("doc_id") / 50).cast("int").alias("pos"),
        (F.col("doc_id") % 100).alias("src"),
    )
    texts = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("src"), F.col("text").alias("para")
    )
    pages = (
        d.join(F.broadcast(texts), "src")
        .groupBy("page_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                "\n",
            ).alias("text")
        )
    )
    return paragraph_dedup(pages, id_col="page_id").withColumnRenamed(
        "doc_id", "page_id"
    )


def _q_url_host_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL blocklist filtering with subdomain (suffix) semantics via
    suffix-explode + broadcast equi-join — never a LIKE nested loop."""
    from access_log_parser_spark.operators.webtext import host_suffix_filter

    docs = _docs_par(spark, sf_dir)
    url = F.concat(
        F.lit("https://sub"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".dom"), (F.col("doc_id") % 13).cast("string"),
        F.lit(".com/p/"), F.col("doc_id").cast("string"),
    )
    pages = docs.select("doc_id", url.alias("url"))
    blocked = spark.createDataFrame(
        [("dom3.com",), ("sub2.dom5.com",), ("dom11.com",)], ["domain"]
    )
    return host_suffix_filter(pages, blocked).select("doc_id", "url")


def _q_html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text over a synthesized html:binary column (the
    input_hint's page payload): script/style blocks and tags must strip,
    entities must decode, and the byte-identical text must come back."""
    from access_log_parser_spark.operators.webtext import html_to_text

    docs = _docs_par(spark, sf_dir)
    html = F.concat(
        F.lit('<html><head><script>var t = "<p>trap</p>";</script>'),
        F.lit("<style>p { color: red }</style></head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit(" &amp; tail &lt;kept&gt;</p></body></html>"),
    )
    pages = docs.select("doc_id", F.encode(html, "utf-8").alias("html"))
    return html_to_text(pages)


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality signals over a seeded corpus: doc_id % 5
    appends bullet lines / a trailing ellipsis line / hash symbols /
    nothing, so every signal and the composite gate take both branches."""
    from access_log_parser_spark.operators.webtext import gopher_quality

    docs = _docs_par(spark, sf_dir)
    tail = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("\n- bullet one\n- bullet two"))
        .when(F.col("doc_id") % 5 == 1, F.lit("\ntrailing thought ..."))
        .when(F.col("doc_id") % 5 == 2, F.lit(" ## ## ## ## ##"))
        .otherwise(F.lit(""))
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), tail).alias("text")
    )
    return gopher_quality(seeded, min_words=20)


def _q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line cleaning over a seeded multi-line corpus: line 1
    (text + '.') always survives (every doc has >= 10 words), line 2
    ('too short.') always drops on min_words, line 3 alternates between
    a kept '!'-terminated line and a dropped no-punctuation line."""
    from access_log_parser_spark.operators.webtext import c4_line_filter

    docs = _docs_par(spark, sf_dir)
    line3 = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit("filler "), F.col("text"), F.lit("!"))
    ).otherwise(F.concat(F.col("text"), F.lit(" no punct")))
    seeded = docs.select(
        "doc_id",
        F.concat_ws(
            "\n", F.concat(F.col("text"), F.lit(".")), F.lit("too short."), line3
        ).alias("text"),
    )
    return c4_line_filter(seeded)


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup: docs 0-249 carry SHOUTED urls with the
    default :443 port, doubled slashes and a trailing slash; docs
    250-499 carry the clean twin. Normalization must converge both forms
    so dedup keeps exactly the lower doc_id of each pair."""
    from access_log_parser_spark.operators.webtext import url_dedup_first

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id") % 250
    messy = F.concat(
        F.lit("HTTPS://EX"), (k % 7).cast("string"),
        F.lit(".COM:443/p//"), k.cast("string"), F.lit("/"),
    )
    clean = F.concat(
        F.lit("https://ex"), (k % 7).cast("string"),
        F.lit(".com/p/"), k.cast("string"),
    )
    pages = docs.select(
        "doc_id", F.when(F.col("doc_id") < 250, messy).otherwise(clean).alias("url")
    )
    return url_dedup_first(pages).select("doc_id", "norm_url")


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: distinct word 3-grams of docs 0-9
    (broadcast) counted against each corpus doc (doc_id 100-299)."""
    from access_log_parser_spark.operators.webtext import contamination_flags

    docs = _docs_par(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300))
    return contamination_flags(corpus, bench, n=3)


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode (strict mode — no stub allowed): valid PNG /
    JPEG payloads are synthesized from doc_id with closed-form dimensions
    (JVM expressions: unhex/lpad/hex build the container headers), and
    operators.multimodal.parse_image_header must read the exact
    width/height/format back out of the magic bytes."""
    from access_log_parser_spark.operators.multimodal import decode_media

    docs = _docs_par(spark, sf_dir).select("doc_id")
    w = (F.lit(16) + F.col("doc_id") % 600).cast("long")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 600).cast("long")
    be4 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    be2 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    png = F.concat(
        F.lit(bytes.fromhex("89504E470D0A1A0A0000000D49484452")),
        be4(w), be4(h),
        F.lit(bytes.fromhex("080600000000000000")),
    )
    jpg = F.concat(
        F.lit(bytes.fromhex("FFD8FFC0001108")),
        be2(h), be2(w),
        F.lit(bytes.fromhex("03000000000000000000FFD9")),
    )
    payload = F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpg)
    meta = decode_media(
        docs.select("doc_id", payload.alias("payload")),
        "doc_id", "payload", strict=True,
    )
    return meta.select("media_id", "n_bytes", "width", "height", "format")


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN: deterministic centroids (vec_id < 3), nprobe=1
    cell probe, exact rounded-cosine re-rank."""
    from access_log_parser_spark.operators.similarity import ivf_ann

    emb = _load(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    return ivf_ann(emb, emb.filter(F.col("vec_id") < 5), cents, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


def _q_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2: each query probes its TWO nearest cells (query-
    side-only fan-out via a sorted-struct slice + bounded explode), so
    recall rises without touching corpus-side cost."""
    from access_log_parser_spark.operators.similarity import ivf_ann

    emb = _load(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    return ivf_ann(emb, emb.filter(F.col("vec_id") < 5), cents, k=5, nprobe=2).select(
        "query_id", "neighbor_id", "rank"
    )


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN. Oracle-backed since round 2:
    ``_ORACLE["ann_lsh"]`` reproduces the md5-derived hyperplane
    bucketing as SQL literals, so the hash gate covers the (recall<1 by
    design) bucketed result exactly. Deterministic hyperplanes."""
    from access_log_parser_spark.operators.similarity import lsh_ann

    emb = _load(spark, sf_dir, "embeddings")
    return lsh_ann(emb, emb.filter(F.col("vec_id") < 5), k=5, dim=64).select(
        "query_id", "neighbor_id", "rank"
    )


def _q_ewma_anomaly_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming EWMA rate-anomaly operator:
    hourly per-event_type counts replayed through the SAME ewma_step
    recurrence the applyInPandasWithState op uses (alpha=0.3,
    threshold=3, warmup=2); the oracle re-derives it with a recursive
    CTE. This is how the custom stateful operator's MATH gets a hard
    oracle even though its micro-batch delivery cannot be SQL'd."""
    from access_log_parser_spark.streaming.anomaly import rate_anomaly_batch

    ev = _load(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH").alias(
            "hour"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = rate_anomaly_batch(counts, order_col="hour", count_col="n")
    return out.select(
        "source",
        F.col("batch_ord").alias("hour"),
        "batch_count",
        F.round(F.col("ewma_before"), 6).alias("ewma_before"),
        "is_anomaly",
    )


def _q_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming WITH a SQL oracle: the shared events table is
    streamed (availableNow file source over a byte-identical copy — the
    file source requires a directory), aggregated per (hour, event_type)
    in complete output mode, and must equal the batch SQL aggregation
    exactly — streaming state and micro-batching change nothing about
    the result."""
    import os
    import shutil
    import tempfile
    import uuid

    src = tempfile.mkdtemp(prefix="alp_stream_events_")
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "events.parquet"))
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(src)
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH")
    agg = stream.groupBy(hour.alias("hour"), F.col("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
    )
    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _q_stream_parse_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PARSE ENGINE under Structured Streaming, oracle-backed: events
    streamed (availableNow), CLF lines synthesized per micro-batch, the
    vectorized decode (mapInPandas works unchanged under streaming) routes
    them, per-(status, pattern_id) counts in complete mode must equal the
    closed-form batch expectation."""
    import os
    import shutil
    import tempfile
    import uuid

    from access_log_parser_spark.engine import fast_parse_routed

    src = tempfile.mkdtemp(prefix="alp_stream_parse_")
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "events.parquet"))
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ev = spark.readStream.schema(schema).parquet(src)
    lines = ev.select(
        F.expr(SRC).alias("source"),
        F.expr(LINE_NO).alias("line_no"),
        F.expr(CLF_LINE).alias("raw"),
    )
    routed = fast_parse_routed(lines, "apache_clf")
    agg = routed.groupBy("status", "pattern_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    name = "stream_parse_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _q_stream_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming corpus-wide paragraph dedup, oracle-backed: 50
    synthesized pages stream through dropDuplicatesWithinWatermark on
    the paragraph digest; the distinct-paragraph count has a closed form
    (5 golden S3 lines + 1 truncated variant = 6)."""
    import os
    import tempfile
    import uuid

    from access_log_parser_spark.pages import synth_pages
    from access_log_parser_spark.streaming.stream import stream_paragraph_dedup

    tmp = tempfile.mkdtemp(prefix="alp_stream_pd_")
    pages_dir = os.path.join(tmp, "pages")
    pages = synth_pages(spark, 50, 10, 5)
    pages.write.mode("overwrite").parquet(pages_dir)
    deduped = stream_paragraph_dedup(spark, pages_dir, pages.schema)
    name = "stream_pd_" + uuid.uuid4().hex[:8]
    (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.countDistinct("digest").cast("bigint").alias("n_digests"),
    )


def _q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming availableNow over a synthesized pages dir ->
    parse -> fan-out -> read back per-status counts. Oracle-backed since
    round 2: ``_ORACLE["stream_windowed_counts"]`` encodes the
    closed-form synth_pages expectations, so the hash gate covers the
    streamed result."""
    import os
    import tempfile

    from access_log_parser_spark.pages import synth_pages
    from access_log_parser_spark.streaming import run_stream_once

    tmp = tempfile.mkdtemp(prefix="alp_stream_")
    pages_dir = os.path.join(tmp, "pages")
    out_dir = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    pages = synth_pages(spark, 50, 10, 5)
    pages.write.mode("overwrite").parquet(pages_dir)
    run_stream_once(spark, pages_dir, pages.schema, out_dir, ckpt, fmt="s3")
    routed = spark.read.parquet(os.path.join(out_dir, "data"))
    return routed.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _deploys(spark: SparkSession) -> DataFrame:
    """Deterministic slowly-changing dimension: 10 'deploy versions' per
    event type at irregular (quadratically spaced) timestamps — versions
    late in the schedule land past the event horizon, so early events
    exercise the no-match (NULL) path of the as-of join."""
    ti = (F.col("id") / 10).cast("int")
    version = (F.col("id") % 10).cast("int")
    hours = (F.lit(17) * version * version + F.lit(5) * ti).cast("int")
    return spark.range(50).select(
        F.element_at(
            F.array(*[F.lit(t) for t in _EVENT_TYPES]), ti + 1
        ).alias("event_type"),
        version.alias("version"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(hours=hours)
        ).alias("deploy_ts"),
    )


def _q_asof_enrich_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event picks up the deploy
    version active at its timestamp (greatest deploy_ts <= ts per
    event_type, inclusive), then aggregates per (event_type, version).
    The union + running-window formulation — ONE hash exchange on the
    key, no range join, no BroadcastNestedLoopJoin; oracle is DuckDB's
    native ASOF LEFT JOIN. Spark has no built-in as-of operator (the
    classic gap the brief calls out); sum is cent-exact bigint."""
    from access_log_parser_spark.operators.asof import asof_join

    ev = _load(spark, sf_dir, "events")
    joined = asof_join(
        ev,
        _deploys(spark),
        on="event_type",
        left_ts="ts",
        right_ts="deploy_ts",
        right_cols=["version"],
    )
    return joined.groupBy("event_type", "version").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_value_c"),
    )


def _q_range_join_ip_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (enrich.binned_range_join): events get a
    synthetic IPv4 (Knuth-hash of user_id), range-joined to 64 irregular
    quadratically-growing address blocks covering [0, 2^32). The bare
    ``lo <= ip < hi`` join would plan as BroadcastNestedLoopJoin; the
    operator explodes each block into covering 2^26-wide bins and
    hash-joins on the bin with the exact range as residual predicate —
    the plan-discipline sweep checks a BroadcastHashJoin comes out."""
    from access_log_parser_spark.enrich import binned_range_join

    ev = _load(spark, sf_dir, "events")
    facts = ev.select(
        "event_id",
        "user_id",
        F.pmod(F.col("user_id") * F.lit(2654435761), F.lit(4294967296)).alias("ip"),
    )
    unit = F.lit(1048576)  # 2^32 / 64^2: block i spans (2i+1) units
    ranges = spark.range(64).select(
        F.col("id").cast("int").alias("range_id"),
        (F.col("id") * F.col("id") * unit).alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1) * unit).alias("hi"),
    )
    joined = binned_range_join(facts, ranges, "ip", bin_size=1 << 26)
    return joined.groupBy("range_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def _q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level boilerplate line removal (webtext.boilerplate_line_
    removal): synthesize 60 five-line pages from the documents table,
    plant a per-group FOOTER on every page and a HEADER on even pages,
    then drop any line occurring in >= 3 distinct pages of the same
    group. The distinct-page count rides ONE exchange as a lag-flag
    window sum — no groupBy+join-back — and pages reassemble in order
    (all-boilerplate pages come back with empty text)."""
    from access_log_parser_spark.operators.webtext import boilerplate_line_removal

    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    page = (F.col("doc_id") % 60).cast("bigint")
    pos = F.floor(F.col("doc_id") / 60).cast("int")
    grp = F.concat(F.lit("g"), (page % 7).cast("string"))
    line = (
        F.when(pos == 4, F.concat(F.lit("FOOTER-"), grp))
        .when((pos == 0) & (page % 2 == 0), F.concat(F.lit("HEADER-"), grp))
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
    )
    paras = docs.select(
        page.alias("page_id"), pos.alias("pos"), grp.alias("grp"), line.alias("line")
    )
    pages = paras.groupBy("page_id").agg(
        F.first("grp").alias("grp"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
    )
    out = boilerplate_line_removal(
        pages, text_col="text", id_col="page_id", group_col="grp", min_docs=3
    )
    return out.select(F.col("doc_id").alias("page_id"), "grp", "text")


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM fluency score (text_quality.unigram_logprob):
    per-doc mean ln p(token) under the corpus's own token frequencies.
    One token-keyed count shuffle builds the vocab, scores reach docs
    via broadcast hash join, per-doc re-agg; 4-dp rounding absorbs
    float summation-order drift across engines."""
    from access_log_parser_spark.operators.text_quality import unigram_logprob

    return unigram_logprob(_docs_par(spark, sf_dir))


def _q_repeated_ngram_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-substring removal (webtext.repeated_ngram_
    span_removal, Lee-et-al-style at token-8-gram granularity): tokens
    covered by an 8-gram occurring in >= 2 distinct docs are removed
    from every doc; the distinct-doc count per gram rides a lag-flag
    window sum on ONE digest exchange (no groupBy+join-back) and the
    n-fold position explode happens only AFTER the >= min_docs filter."""
    from access_log_parser_spark.operators.webtext import repeated_ngram_span_removal

    return repeated_ngram_span_removal(_docs_par(spark, sf_dir), n=8, min_docs=2)


def _q_card_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-validated payment-card PII signal (webtext.card_signals):
    cards planted deterministically (a valid test PAN on doc_id%7==0,
    an invalid checksum on %7==1) so both the regex candidate path and
    the Luhn false-positive gate are exercised; the checksum is a pure
    aggregate expression over the digit positions — no UDF."""
    from access_log_parser_spark.operators.webtext import card_signals

    planted = _docs_par(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" pay 4111 1111 1111 1111 now"))
            .when(F.col("doc_id") % 7 == 1, F.lit(" ref 4111-1111-1111-1112 end"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return card_signals(planted)


def _q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture resample (sampling.temperature_
    mixture_sample, alpha=0.5): per-source keep rates from the corpus's
    own stratum counts (ppm-quantized so the oracle is bit-exact),
    membership content-addressed on md5(doc_id) — stable under
    repartitioning; the rate table broadcasts, the fact side never
    shuffles for the join. Returns per-source in/kept counts + rate."""
    from access_log_parser_spark.operators.sampling import (
        temperature_mixture_rates,
        temperature_mixture_sample,
    )

    docs = _load(spark, sf_dir, "documents")
    kept = (
        temperature_mixture_sample(docs, alpha=0.5, target_frac=0.5)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    rates = temperature_mixture_rates(docs, alpha=0.5, target_frac=0.5).select(
        F.col("stratum").alias("source"), "n_in", "rate_ppm"
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_in",
        "rate_ppm",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
    )


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (packing.chunk_documents): 64-token
    windows at stride 48, last window right-aligned — pure per-row HOF
    expansion (sequence -> transform -> posexplode), zero shuffles;
    integer-exact starts so the oracle reproduces them."""
    from access_log_parser_spark.operators.packing import chunk_documents

    return chunk_documents(
        _docs_par(spark, sf_dir), chunk_tokens=64, stride=48
    )


def _q_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier serving path (text_quality.linear_
    quality_score): hashed token buckets -> integer-arithmetic weight
    table -> mean logit -> sigmoid, all column expressions; the oracle
    reproduces scores exactly (integer weights, 4-dp rounding)."""
    from access_log_parser_spark.operators.text_quality import linear_quality_score

    return linear_quality_score(_docs_par(spark, sf_dir))


def _q_script_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script histogram + dominant script (text_quality.
    script_signals): Cyrillic/CJK/Arabic snippets planted on a
    deterministic doc_id schedule so every class and the tie/none paths
    are exercised; counts are exact char-class subtractions, argmax is
    first-wins — engine-exact, no floats."""
    from access_log_parser_spark.operators.text_quality import script_signals

    planted = _docs_par(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 5 == 1, F.lit(" привет мир как дела сегодня"))
            .when(F.col("doc_id") % 5 == 2, F.lit(" 你好世界今天天气很好谢谢再见"))
            .when(F.col("doc_id") % 5 == 3, F.lit(" مرحبا بالعالم كيف حالك اليوم"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_signals(planted)


def _q_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-generation curation composite: the round-3 gates composed
    as pure PROJECTIONS in ONE plan — linear quality-classifier score
    (hashed-bucket weight fold), dominant-Unicode-script gate, and
    card-PII (Luhn-valid PAN) gate — then a per-source aggregate. The
    optimized plan has ZERO joins: the only exchange is the final
    groupBy(source). Planted rows exercise every gate: doc_id%11==1
    becomes pure Cyrillic (script gate drops), doc_id%13==0 gets a
    Luhn-valid card appended (PII gate drops). The aggregate reports
    the kept-score mass as an exact integer (sum of round(score*1e4))
    so the oracle hash cannot drift on float summation order."""
    from access_log_parser_spark.operators.text_quality import (
        dominant_script_col,
        linear_quality_score_col,
    )
    from access_log_parser_spark.operators.webtext import card_luhn_count_col

    docs = _docs_par(spark, sf_dir)
    planted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 11 == 1,
            F.lit("привет мир как дела сегодня друзья"),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" pay 4111 1111 1111 1111 now"),
            ),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    gated = planted.select(
        "source",
        linear_quality_score_col(F.col("text")).alias("score"),
        dominant_script_col(F.col("text")).alias("main_script"),
        card_luhn_count_col(F.col("text")).alias("n_pan"),
    ).filter(
        (F.col("main_script") == "latin")
        & (F.col("n_pan") == 0)
        & (F.col("score") >= 0.45)
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum(F.round(F.col("score") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("sum_score_x1e4"),
    )


def _q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality gate (webtext.domain_quality_filter): score
    every doc with the hashed linear classifier, aggregate per source
    domain, drop WHOLE domains whose integer-exact mean falls below
    0.45 — the FineWeb/RefinedWeb spam-domain move. Sources with suffix
    % 3 == 0 get 200 copies of 'tok95' (bucket weight -0.496) planted,
    dragging their domain mean to ~0.42; the other 13 domains sit at
    ~0.50 and survive. Verdict arithmetic is all-integer (cross-
    multiplied sum >= mean*n), so keep/drop cannot drift between
    engines. Plan: one domain agg shuffle + broadcast verdict join."""
    from access_log_parser_spark.operators.webtext import domain_quality_filter

    docs = _docs_par(spark, sf_dir)
    spam = F.lit(" tok95" * 200)
    planted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.substring("source", 4, 10).cast("int") % 3 == 0,
            F.concat(F.coalesce(F.col("text"), F.lit("")), spam),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    kept = domain_quality_filter(planted, min_mean_x1e4=4500, min_docs=20)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("score_x1e4").cast("bigint").alias("sum_score_x1e4"),
    )


def _q_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming incremental near-dup dedup, hash-oracle-backed:
    300 docs replay as 4 deterministic doc_id-ordered micro-batches
    through streaming/neardup.py — MinHash HOF signatures -> LSH band
    keys -> drop iff a band has an earlier owner (in-batch window) or
    is in the growing cross-batch index. Because batches arrive in
    doc_id order the greedy stream equals the closed-form global rule
    ``min over bands of (min owner) == doc_id``, which the oracle
    evaluates in SQL from the SAME signature formula (proof sketch in
    the module docstring; replay idempotence in tests)."""
    import os
    import tempfile

    from access_log_parser_spark.streaming.neardup import (
        run_streaming_minhash_dedup,
        write_ordered_batches,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 300) & F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    tmp = tempfile.mkdtemp(prefix="alp_stream_mh_")
    in_dir = os.path.join(tmp, "in")
    write_ordered_batches(docs, in_dir, n_batches=4)
    run_streaming_minhash_dedup(
        spark,
        in_dir,
        docs.schema,
        os.path.join(tmp, "out"),
        os.path.join(tmp, "idx"),
        os.path.join(tmp, "ck"),
        # n_key_buckets auto-sizes from the corpus (neardup
        # .auto_key_buckets): the kb bucket count is a physical layout
        # knob only — it never changes which docs are kept (the oracle
        # is bucket-blind) — and sizing it from scale is what keeps
        # per-batch commit overhead bounded at 300 docs AND pruning
        # selective at 10^12 (r04 verdict item #5).
    )
    return spark.read.parquet(os.path.join(tmp, "out")).select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    )


def _q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout key (functions/zorder.py): Morton-interleave of
    (hour-of-day, user_id%64) buckets for every event, aggregated by
    curve segment. BOTH engines evaluate the SAME generated shift/mask
    SQL term (zorder_sql_term), so the oracle checks the interleave
    bit-for-bit; write_zordered range-partitions on this key so parquet
    footer min/max prunes on either dimension (proof in
    tests/test_zorder.py::test_zorder_write_prunes_secondary_dimension)."""
    from access_log_parser_spark.functions.zorder import zorder_sql_term

    b = _load(spark, sf_dir, "events").select(
        F.hour("ts").alias("bx"), (F.col("user_id") % 64).alias("by")
    )
    z = b.select(F.expr(zorder_sql_term(["bx", "by"], bits=6)).alias("zkey"))
    return z.groupBy(F.shiftright("zkey", 6).cast("bigint").alias("z_prefix")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("zkey").cast("bigint").alias("zmin"),
        F.max("zkey").cast("bigint").alias("zmax"),
    )


def _q_host_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap (webtext.host_frequency_cap): keep at most
    20 docs per source domain, picked content-addressed by
    (md5(doc_id), doc_id) so the sample is crawl-order-free. The oracle
    replays the exact pick with ROW_NUMBER over the same md5 key. Plan:
    one exchange on the host key + in-partition window sort."""
    from access_log_parser_spark.operators.webtext import host_frequency_cap

    docs = _load(spark, sf_dir, "documents")
    capped = host_frequency_cap(docs, "source", k=20)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )


def _q_encoding_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-noise battery (webtext.encoding_signals) with planted
    corruption: docs with doc_id % 5 == 0 get a U+FFFD + two C0 control
    bytes appended, docs with doc_id % 7 == 0 (and not % 5) get two
    classic mojibake digraphs. Pure regexp_count projection, zero
    shuffle; the oracle plants the identical bytes with chr() codes and
    counts with regexp_extract_all."""
    from access_log_parser_spark.operators.webtext import encoding_signals

    docs = _load(spark, sf_dir, "documents")
    noise = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("\ufffd x \u0001\u0002"))
        .when(F.col("doc_id") % 7 == 0, F.lit("Ã© q â€™"))
        .otherwise(F.lit(""))
    )
    planted = docs.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), noise).alias("text"),
    )
    sig = encoding_signals(planted)
    return sig.select(
        "doc_id",
        "n_replacement",
        "n_control",
        "n_mojibake",
        F.col("enc_clean").cast("bigint").alias("enc_clean"),
    )


def _q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization
    (similarity.quantize_embeddings): per-vector scale = max|x|/127,
    codes = floor(x/scale + 0.5) — array HOFs only, one scan, no
    shuffle. Integer outputs (sum/min/max of codes) make the check
    bit-exact; scale rides as a 9-dp rounded double. The oracle replays
    the same IEEE-double expression with list_transform."""
    from access_log_parser_spark.operators.similarity import quantize_embeddings

    emb = _load(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    return q.select(
        F.col("id").cast("bigint").alias("vec_id"),
        F.size("codes").cast("bigint").alias("dim"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_codes"),
        F.array_min("codes").cast("bigint").alias("min_code"),
        F.array_max("codes").cast("bigint").alias("max_code"),
        F.round(F.col("scale"), 9).alias("scale_r9"),
    )


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (similarity.semdedup): every vector whose vec_id is a
    multiple of 10 is planted a second time (vec_id + 100000, same
    embedding) — an exact semantic duplicate. Six centroids are the
    content-addressed (md5(vec_id), vec_id) pick from the base set;
    assignment is the unrolled broadcast argmax (dot score, ties to the
    higher centroid id), pruning drops any vector with a lower-id
    within-cell neighbor at round(cos,6) >= 0.95 — so every planted
    copy dies, ambient pairs per the same rule. The oracle replays
    centroid pick, argmax, and prune in SQL."""
    from access_log_parser_spark.operators.similarity import (
        select_centroids_by_hash,
        semdedup,
    )

    base = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = base.unionByName(
        base.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    cents = select_centroids_by_hash(base, 6)
    kept = semdedup(planted, cents, threshold=0.95)
    return kept.groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("id").cast("bigint").alias("sum_id"),
    )


def _q_semdedup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semdedup's production-k assignment path (ivf_assign_join:
    broadcast hash join + one per-id argmax aggregation instead of the
    unrolled literal expression) over the SAME planted corpus as the
    ``semdedup`` query — forced via assign_join_threshold=0. Results
    must be identical to the literal path, so the oracle is the same
    SQL replay; what this row pins is that the join path's tie-break
    and float behavior match at the driver gate, not just in unit
    tests."""
    from access_log_parser_spark.operators.similarity import (
        select_centroids_by_hash,
        semdedup,
    )

    base = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = base.unionByName(
        base.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    cents = select_centroids_by_hash(base, 6)
    kept = semdedup(planted, cents, threshold=0.95, assign_join_threshold=0)
    return kept.groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("id").cast("bigint").alias("sum_id"),
    )


def _q_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact substring dedup (dedup.block_dedup, the
    Lee-et-al ExactSubstr approximation): every doc is prefixed with an
    8-token licence block shared by its doc_id %% 5 class, block size 8
    aligns it exactly, so the dedup must strip it from every doc except
    each class's first owner while the per-doc tail blocks survive. The
    oracle replays tokenization, aligned slicing, the global min-owner
    window and the reassembly in SQL."""
    from access_log_parser_spark.operators.dedup import block_dedup

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 300)
    pre = F.concat(
        F.lit("shared license block variant v"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(" applies here now "),
    )
    planted = docs.select(
        "doc_id",
        F.concat(pre, F.coalesce(F.col("text"), F.lit(""))).alias("text"),
    )
    out = block_dedup(planted, block_tokens=8)
    return out.select(
        F.col("id").cast("bigint").alias("doc_id"),
        "text",
        "n_blocks",
        "n_removed",
    )


def _q_cross_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-snapshot dedup (dedup.cross_snapshot_dedup):
    docs with doc_id % 7 == 0 form the OLD snapshot; the rest form the
    NEW one, with plants — doc_id % 11 == 3 re-crawls its donor's text
    verbatim (exact dup), % 11 == 5 appends ' zz tail' (near dup caught
    by a shared LSH band). Survivors aggregate per source. The oracle
    replays the plant, the md5 anti-join, and the full 16-perm/4-band
    MinHash band anti-join in SQL."""
    from access_log_parser_spark.operators.dedup import cross_snapshot_dedup

    docs = _docs_par(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", "source", "text"
    )
    donors = old.select(
        F.col("doc_id").alias("o_id"), F.col("text").alias("o_text")
    )
    planted = (
        new.alias("n")
        .join(
            donors.alias("o"),
            (F.col("n.doc_id") - F.col("n.doc_id") % 7) == F.col("o_id"),
            "left",
        )
        .select(
            "n.doc_id",
            "n.source",
            F.when(
                (F.col("n.doc_id") % 11 == 3) & F.col("o_text").isNotNull(),
                F.col("o_text"),
            )
            .when(
                (F.col("n.doc_id") % 11 == 5) & F.col("o_text").isNotNull(),
                F.concat(F.col("o_text"), F.lit(" zz tail")),
            )
            .otherwise(F.col("n.text"))
            .alias("text"),
        )
    )
    kept = cross_snapshot_dedup(planted, old)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )


def _q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity tiers (text_quality.perplexity_buckets):
    corpus-unigram LM score per doc (same model as unigram_logprob),
    then ntile(3) head/middle/tail per source over the total order
    (mean_logprob DESC, doc_id). One token-count shuffle + broadcast
    score join + one exchange on the group key. The oracle replays the
    LM and the NTILE cut exactly."""
    from access_log_parser_spark.operators.text_quality import (
        perplexity_buckets,
    )

    docs = _docs_par(spark, sf_dir)
    out = perplexity_buckets(docs, key_col="source", n_buckets=3)
    return out.select(
        "doc_id",
        "source",
        "n_tokens",
        "mean_logprob",
        F.col("bucket").cast("bigint").alias("bucket"),
    )


def _q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (sampling.dsir_select): raw corpus =
    docs 0-399, target = docs 400-449; hashed-unigram (256-bucket)
    importance log-weights, keep the 50 most target-like. Oracle replays
    the md5 bucketing, add-1 smoothing and log-ratio sum in DuckDB —
    weights are bit-exact, selection a total order."""
    from access_log_parser_spark.operators.sampling import dsir_select

    docs = _docs_par(spark, sf_dir)
    raw = docs.filter(F.col("doc_id") < 400)
    tgt = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450))
    return dsir_select(raw, tgt, k=50, buckets=256)


def _q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle (sampling.epoch_shuffle):
    epoch-3 permutation of docs 0-499 by md5('3:'||doc_id) rank; the
    oracle is the same ROW_NUMBER in DuckDB. Runs the default OFFSETS
    strategy (deterministic md5-prefix buckets + per-bucket numbering +
    broadcast offsets — no WindowExec), so the driver gate proves the
    100-TB plan, not the legacy partition-less window. Plain read, not
    _docs_par: the operator's own bucket-range exchange already
    redistributes the single input split, so a round-robin shuffle in
    front of it would be a second, wasted full-data exchange."""
    from access_log_parser_spark.operators.sampling import epoch_shuffle

    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return epoch_shuffle(docs.select("doc_id"), epoch=3)


def _q_keep_best_duplicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact-dup resolution (dedup.keep_best_duplicate):
    THREE planted copies per doc (ids +0/+100000/+200000) with synthetic
    score = doc_id % 7 — the winner per content group must be the
    argmax-score copy (tie -> min id), NOT the min-id copy that plain
    exact dedup keeps."""
    from access_log_parser_spark.operators.dedup import keep_best_duplicate

    base = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    corpus = base.unionAll(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).unionAll(base.select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
    scored = corpus.withColumn("score", (F.col("doc_id") % 7).cast("double"))
    return keep_best_duplicate(scored, "score")


def _q_url_spam_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft URL-spam scoring (webtext.url_spam_score): every 10th doc
    carries a lexicon-stuffed hyphenated-host URL, every 7th a
    digit-heavy host, the rest clean news URLs; the oracle replays the
    weighted substring counts + structural signals with
    regexp_extract_all."""
    from access_log_parser_spark.operators.webtext import url_spam_score

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    spam = F.concat(F.lit("http://free-porn-casino-7."), k, F.lit(".example/xxx?ad=viagra"))
    digity = F.concat(F.lit("http://12345"), k, F.lit(".example/page/"), k)
    clean = F.concat(F.lit("https://news.example"), (F.col("doc_id") % 5).cast("string"), F.lit(".org/article/"), k)
    pages = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, spam)
        .when(F.col("doc_id") % 7 == 0, digity)
        .otherwise(clean)
        .alias("url"),
    )
    return url_spam_score(pages)


def _q_sitemap_locs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap crawl seeding (webtext.sitemap_locs): every doc's host
    publishes a 2-entry urlset (one loc whitespace-padded, one
    uppercase-tagged); oracle replays the same regex extraction with
    UNNEST WITH ORDINALITY-style positions."""
    from access_log_parser_spark.operators.webtext import sitemap_locs

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc> https://s'),
        k, F.lit('.example/a/'), k,
        F.lit(' </loc></url><url><LOC>https://s'),
        k, F.lit('.example/b/'), k,
        F.lit('</LOC></url></urlset>'),
    )
    sites = docs.select(
        F.concat(F.lit("s"), k, F.lit(".example")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    return sitemap_locs(sites)


def _q_sitemap_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-protocol tree classification (webtext.sitemap_tree):
    doc_id %% 3 publishes a <sitemapindex> (2 child sitemaps — must be
    tagged 'index', i.e. fetch-and-expand, NOT page URLs), a <urlset>
    (2 pages), or a malformed root whose loc still surfaces under
    'unknown' for quarantine. Oracle is closed-form per variant."""
    from access_log_parser_spark.operators.webtext import sitemap_tree

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    xml = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<?xml version="1.0"?><sitemapindex><sitemap>'
                      "<loc>https://s"),
                k, F.lit(".example/sm1.xml</loc></sitemap><sitemap><loc>"
                         "https://s"),
                k, F.lit(".example/sm2.xml</loc></sitemap>"
                         "</sitemapindex>"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<?xml version="1.0"?><urlset><url><loc>https://s'),
                k, F.lit(".example/a/"), k,
                F.lit("</loc></url><url><loc>https://s"),
                k, F.lit(".example/b/"), k,
                F.lit("</loc></url></urlset>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<garbage><loc>https://s"), k,
                F.lit(".example/x</loc></garbage>"),
            )
        )
    )
    sites = docs.select(
        F.concat(F.lit("s"), k, F.lit(".example")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    return sitemap_tree(sites)


def _q_meta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-refresh soft-redirect extraction
    (webtext.meta_refresh_redirects): doc_id %% 4 plants http-equiv-
    first / content-first / a refresh WITHOUT a url= (must not emit) /
    no refresh at all. Oracle is closed-form per variant."""
    from access_log_parser_spark.operators.webtext import (
        meta_refresh_redirects,
    )

    docs = _docs_par(spark, sf_dir)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    body = F.concat(
        F.lit("<body>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</body></html>"),
    )
    h = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<html><head><meta http-equiv="refresh" '
                      'content="0;url=https://t.example/r'), k,
                F.lit('"></head>'), body,
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<html><head><meta content="5; url=/local/'), k,
                F.lit('" http-equiv="Refresh"></head>'), body,
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit('<html><head><meta http-equiv="refresh" '
                      'content="30"></head>'), body,
            ),
        )
        .otherwise(F.concat(F.lit("<html>"), body))
    )
    return meta_refresh_redirects(
        docs.select("doc_id", F.encode(h, "utf-8").alias("html"))
    )


def _q_build_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (retrieval.build_postings) over
    documents 0-199 with a cap of 3 postings per token — small enough
    that cap truncation actually fires on common tokens; the oracle
    replays the (tf desc, id asc) rank and the ordered string_agg."""
    from access_log_parser_spark.operators.retrieval import build_postings

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 200)
    return build_postings(docs, max_postings=3)


def _q_sitemap_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sitemap urlset parsing (webtext.sitemap_entries): each host
    publishes 3 url blocks — /a/ with lastmod (half with a datetime
    suffix the date-prefix cast strips), mixed-case changefreq on every
    3rd host, numeric priority; /b/ bare except a NON-numeric priority
    on every 5th host (NULL via try_cast); and a loc-LESS block that
    must be dropped while still consuming position 3. Oracle is
    closed-form expected values per block."""
    from access_log_parser_spark.operators.webtext import sitemap_entries

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 400)
    k = F.col("doc_id").cast("string")
    mm = F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0")
    dd = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    lastmod = F.concat(
        F.lit("2024-"), mm, F.lit("-"), dd,
        F.when(F.col("doc_id") % 2 == 0, F.lit("T10:30:00Z"))
        .otherwise(F.lit("")),
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>https://s'),
        k, F.lit(".example/a/"), k,
        F.lit("</loc><lastmod> "), lastmod, F.lit(" </lastmod>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("<changefreq>Daily</changefreq>"),
        ).otherwise(F.lit("")),
        F.lit("<priority>0."), (F.col("doc_id") % 10).cast("string"),
        F.lit("</priority></url><url><loc>https://s"),
        k, F.lit(".example/b/"), k, F.lit("</loc>"),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("<priority>high</priority>")
        ).otherwise(F.lit("")),
        F.lit("</url><url><lastmod>2099-01-01</lastmod></url></urlset>"),
    )
    sites = docs.select(
        F.concat(F.lit("s"), k, F.lit(".example")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    out = sitemap_entries(sites)
    # DATE comes back as datetime.date from Spark but Timestamp from
    # DuckDB's pandas bridge — compare as the ISO string
    return out.withColumn(
        "lastmod_date", F.col("lastmod_date").cast("string")
    )


def _q_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-k-per-stratum selection (sampling.stratified_topk): the 5
    longest documents per source, ties to the lower doc_id; oracle is
    the same window rank in DuckDB."""
    from access_log_parser_spark.operators.sampling import stratified_topk

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500).select(
        "doc_id", "source",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        .alias("n_chars"),
    )
    return stratified_topk(docs, "source", "n_chars", k=5)


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS sampling without replacement (sampling.weighted_sample_topk,
    Efraimidis-Spirakis A-ES): 10 docs per source drawn with weight
    doc_id%7+1 via the -ln(u)/w exp-sort key over the engine-portable
    md5 uniform; the oracle replays the key math and window rank."""
    from access_log_parser_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = _docs_par(spark, sf_dir).select(
        "doc_id", "source",
        (F.col("doc_id") % 7 + 1).cast("double").alias("weight"),
    )
    return weighted_sample_topk(
        docs, k=10, weight_col="weight", stratum_col="source"
    )


def _q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl gate end-to-end (webtext.robots_txt_rules +
    robots_allowed): 7 hosts share a robots body with a comment, a
    non-applicable googlebot group, an empty Disallow and a
    longest-match Allow-inside-Disallow pair; URLs route by doc_id %% 3
    into disallowed / allowed-override / unruled paths. The oracle is
    CLOSED-FORM (it states what the planted rules imply per URL — the
    parser itself is pinned by unit tests)."""
    from access_log_parser_spark.operators.webtext import (
        robots_allowed,
        robots_txt_rules,
    )

    hosts = spark.range(7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example")).alias("host"),
        F.lit(
            "# crawl policy\n"
            "User-agent: googlebot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /blocked/\n"
            "Allow: /blocked/open/\nDisallow:\n"
        ).alias("robots_txt"),
    )
    rules = robots_txt_rules(hosts)
    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    h = F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example"))
    urls = docs.select(
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(h, F.lit("/blocked/p"), k))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(h, F.lit("/blocked/open/p"), k))
        .otherwise(F.concat(h, F.lit("/fine/p"), k))
        .alias("url")
    )
    return robots_allowed(urls, rules)


def _q_robots_gate_wildcards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 WILDCARD rules end-to-end (the r03 ADVICE fix:
    webtext.robots_allowed used to treat '*'/'$' rules as never-matching
    literal prefixes, failing open). 7 hosts share a robots body with a
    '$'-anchored extension block, a bare-star disallow and a longer
    wildcard Allow override; URLs route by doc_id %% 4 into pdf-blocked /
    star-blocked / allow-override / anchor-miss paths. The oracle is
    CLOSED-FORM (it states what the planted wildcard rules imply per
    URL — the regex translation itself is pinned by unit tests)."""
    from access_log_parser_spark.operators.webtext import (
        robots_allowed,
        robots_txt_rules,
    )

    hosts = spark.range(7).select(
        F.concat(F.lit("w"), F.col("id").cast("string"),
                 F.lit(".example")).alias("host"),
        F.lit(
            "User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /tmp*\n"
            "Allow: /tmp/public*\n"
        ).alias("robots_txt"),
    )
    rules = robots_txt_rules(hosts)
    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    h = F.concat(F.lit("https://w"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example"))
    urls = docs.select(
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(h, F.lit("/files/r"), k, F.lit(".pdf")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(h, F.lit("/tmp/x"), k))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(h, F.lit("/tmp/public/x"), k))
        .otherwise(F.concat(h, F.lit("/ok/p"), k, F.lit(".pdfx")))
        .alias("url")
    )
    return robots_allowed(urls, rules)


def _q_robots_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap directives from robots.txt (webtext.robots_sitemaps):
    every doc becomes a host whose robots body carries two Sitemap
    lines (one upper-cased, RFC key case-insensitivity) interleaved
    with groups, rules and comments — Sitemap is GLOBAL, so both come
    back in order regardless of the surrounding groups. Closed-form
    oracle."""
    from access_log_parser_spark.operators.webtext import robots_sitemaps

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    body = F.concat(
        F.lit("# policy\nUser-agent: *\nDisallow: /x\n"
              "Sitemap: https://s"), k, F.lit(".example/sm1.xml\n"
              "User-agent: googlebot\nDisallow: /\n"
              "SITEMAP: https://s"), k, F.lit(".example/sm2.xml\n"),
    )
    hosts = docs.select(
        F.concat(F.lit("s"), k, F.lit(".example")).alias("host"),
        body.alias("robots_txt"),
    )
    return robots_sitemaps(hosts)


def _q_robots_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay politeness extraction (webtext.robots_crawl_delay):
    each doc-host plants a googlebot group (delay 1, must NOT apply to
    '*'), TWO applicable '*' groups with delays (doc_id%7)+0.5 and
    (doc_id%7)+2 (min wins), and a non-numeric directive (ignored).
    Closed-form oracle: crawl_delay = doc_id%7 + 0.5 per host."""
    from access_log_parser_spark.operators.webtext import robots_crawl_delay

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    d7 = (F.col("doc_id") % 7).cast("string")
    body = F.concat(
        F.lit("User-agent: googlebot\nCrawl-delay: 1\n\n"
              "User-agent: *\nCrawl-delay: "), d7, F.lit(".5\n\n"
              "User-agent: *\nCrawl-delay: "),
        ((F.col("doc_id") % 7) + 2).cast("string"),
        F.lit("\n\nUser-agent: slowbot\nCrawl-delay: oops\n"),
    )
    hosts = docs.select(
        F.concat(F.lit("d"), k, F.lit(".example")).alias("host"),
        body.alias("robots_txt"),
    )
    return robots_crawl_delay(hosts)


def _q_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record scan (sources/warc.py): every doc becomes a 2-record
    WARC member (an HTTP response + a metadata record) BUILT with
    expressions — Content-Length computed via octet_length — and the
    byte-accurate parser must recover exactly the closed-form fields
    the oracle states (it never re-parses; it asserts what the bytes
    encode). Exercises multi-record iteration, HTTP body slicing and
    the non-HTTP block path."""
    from access_log_parser_spark.sources.warc import parse_warc_records

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</body></html>"),
    )
    uri = F.concat(F.lit("https://warc.example/"), k)
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html
    )
    def _rec(wtype, block):  # noqa: E306
        return F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: "), F.lit(wtype),
            F.lit("\r\nWARC-Target-URI: "), uri,
            F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
            F.octet_length(block).cast("string"),
            F.lit("\r\n\r\n"), block, F.lit("\r\n\r\n"),
        )
    meta_block = F.concat(
        F.lit("len="), F.octet_length(html).cast("string")
    )
    files = docs.select(
        F.concat(F.lit("mem://"), k).alias("path"),
        F.encode(
            F.concat(_rec("response", http), _rec("metadata", meta_block)),
            "utf-8",
        ).alias("content"),
    )
    parsed = parse_warc_records(files)
    return parsed.select(
        "source",
        "record_idx",
        "warc_type",
        "target_uri",
        F.coalesce(F.col("http_status"), F.lit(-1))
        .cast("bigint")
        .alias("http_status"),
        F.decode(F.col("html"), "utf-8").alias("body"),
        "truncated",
    )


def _q_warc_to_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC -> WET conversion (sources/warc.warc_to_wet): same 2-record
    members as warc_scan; only the HTTP-200 response record survives
    and its payload runs the shared html_text_col extraction chain —
    output shaped exactly like wet_scan. Oracle replays the chain over
    the closed-form html string (the metadata record never appears)."""
    from access_log_parser_spark.sources.warc import (
        parse_warc_records,
        warc_to_wet,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</body></html>"),
    )
    uri = F.concat(F.lit("https://warc.example/"), k)
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html
    )
    def _rec(wtype, block):  # noqa: E306
        return F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: "), F.lit(wtype),
            F.lit("\r\nWARC-Target-URI: "), uri,
            F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
            F.octet_length(block).cast("string"),
            F.lit("\r\n\r\n"), block, F.lit("\r\n\r\n"),
        )
    meta_block = F.concat(
        F.lit("len="), F.octet_length(html).cast("string")
    )
    files = docs.select(
        F.concat(F.lit("mem://"), k).alias("path"),
        F.encode(
            F.concat(_rec("response", http), _rec("metadata", meta_block)),
            "utf-8",
        ).alias("content"),
    )
    return warc_to_wet(parse_warc_records(files))


def _q_http_status_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP-layer routing (sources/warc.parse_warc_http +
    status_class_col): the north-rule parse->route->aggregate shape at
    the HTTP tier. Five closed-form response variants per doc_id%5 —
    200+charset, 200 json, 301+Location, 404 quoted-charset, and a
    non-HTTP garbage block that must route 'unmatched', never drop —
    aggregated per (status_class, content_type, charset) sink. The
    oracle states the closed-form counts and body octet sums the bytes
    encode."""
    from access_log_parser_spark.sources.warc import (
        parse_warc_http,
        status_class_col,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 600)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    html = F.concat(
        F.lit("<html><body>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</body></html>"),
    )
    uri = F.concat(F.lit("https://warc.example/"), k)
    status_line = (
        F.when(m == 2, F.lit("HTTP/1.1 301 Moved Permanently"))
        .when(m == 3, F.lit("HTTP/1.1 404 Not Found"))
        .otherwise(F.lit("HTTP/1.1 200 OK"))
    )
    ct_hdr = (
        F.when(m == 0, F.lit("\r\nContent-Type: text/html; charset=UTF-8"))
        .when(m == 1, F.lit("\r\nContent-Type: application/json"))
        .when(m == 2, F.lit("\r\nContent-Type: text/html"))
        .otherwise(
            F.lit('\r\nContent-Type: Text/HTML; charset="iso-8859-1"')
        )
    )
    loc_hdr = F.when(
        m == 2,
        F.concat(F.lit("\r\nLocation: https://warc.example/redir/"), k),
    ).otherwise(F.lit(""))
    http = F.concat(
        status_line, ct_hdr, loc_hdr,
        F.lit("\r\nContent-Length: "),
        F.octet_length(html).cast("string"),
        F.lit("\r\n\r\n"), html,
    )
    block = F.when(m == 4, F.concat(F.lit("GARBAGE "), html)).otherwise(http)
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
        F.octet_length(block).cast("string"),
        F.lit("\r\n\r\n"), block, F.lit("\r\n\r\n"),
    )
    files = docs.select(
        F.concat(F.lit("mem://"), k).alias("path"),
        F.encode(rec, "utf-8").alias("content"),
    )
    parsed = parse_warc_http(files)
    return (
        parsed.withColumn(
            "status_class", status_class_col(F.col("http_status"))
        )
        .groupBy("status_class", "content_type", "charset")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.count("http_location").alias("n_redirects"),
            F.sum(F.octet_length("html")).alias("body_bytes"),
        )
    )


def _q_wet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET extracted-text scan (sources/warc.wet_records): every doc
    becomes a WET member (one conversion record whose block IS the
    text, plus a request record that must be filtered out) built with
    expressions; the closed-form oracle asserts the recovered text and
    framing fields."""
    from access_log_parser_spark.sources.warc import wet_records

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    body = F.coalesce(F.col("text"), F.lit(""))
    uri = F.concat(F.lit("https://wet.example/"), k)
    def _rec(wtype, block):  # noqa: E306
        return F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: "), F.lit(wtype),
            F.lit("\r\nWARC-Target-URI: "), uri,
            F.lit("\r\nWARC-Date: 2024-02-02T00:00:00Z\r\nContent-Length: "),
            F.octet_length(block).cast("string"),
            F.lit("\r\n\r\n"), block, F.lit("\r\n\r\n"),
        )
    files = docs.select(
        F.concat(F.lit("wet://"), k).alias("path"),
        F.encode(
            F.concat(_rec("request", F.lit("GET /")), _rec("conversion", body)),
            "utf-8",
        ).alias("content"),
    )
    out = wet_records(files)
    return out.select(
        "source",
        "record_idx",
        "target_uri",
        "warc_date",
        "text",
        "truncated",
    )


def _q_wat_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT metadata scan (sources/warc.wat_records) + columnar JSON
    envelope extraction: the metadata record's block is a real WAT-style
    Envelope (hyphenated keys exercised via bracket JSON paths); the
    query pulls Actual-Content-Length back out with get_json_object —
    proving the JVM-side extraction path — and the closed-form oracle
    recomputes it as octet_length(text)."""
    from access_log_parser_spark.sources.warc import wat_records

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    body = F.coalesce(F.col("text"), F.lit(""))
    uri = F.concat(F.lit("https://wat.example/"), k)
    payload = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"'),
        uri,
        F.lit('"},"Payload-Metadata":{"Actual-Content-Length":'),
        F.octet_length(body).cast("string"),
        F.lit("}}}"),
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "), uri,
        F.lit("\r\nWARC-Date: 2024-02-02T00:00:00Z\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"),
    )
    files = docs.select(
        F.concat(F.lit("wat://"), k).alias("path"),
        F.encode(rec, "utf-8").alias("content"),
    )
    out = wat_records(files)
    return out.select(
        "source",
        "target_uri",
        F.get_json_object(
            F.col("payload_json"),
            "$.Envelope['Payload-Metadata']['Actual-Content-Length']",
        ).cast("bigint").alias("content_length"),
        "truncated",
    )


def _q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor extraction (webtext.extract_links): every page carries one
    absolute and one relative link; each must come back paired with its
    tag-stripped anchor text. Oracle unnests the same whole-tag regex
    matches and replays the per-tag href/anchor extraction."""
    from access_log_parser_spark.operators.webtext import extract_links

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    h = F.concat(
        F.lit('<p>see <a href="https://ex'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('.org/a/'), k, F.lit('">article <b>'), k,
        F.lit('</b></a> and <a href="/rel/'), k,
        F.lit('">related reading</a></p>'),
    )
    pages = docs.select("doc_id", F.encode(h, "utf-8").alias("html"))
    return extract_links(pages)


def _q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation per link target (webtext.anchor_stats):
    500 synthetic edges fan in on 25 targets (doc_id % 25) from 7
    source hosts (doc_id % 7), with anchors cycling by doc_id % 3
    between 'click here', 'page <t>' and EMPTY — empty anchors count
    toward n_links but never become top_anchor. Oracle replays the
    (target, anchor) counts, the frequency-then-lexicographic argmax
    and the distinct-host counts."""
    from access_log_parser_spark.operators.webtext import anchor_stats

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    t = (F.col("doc_id") % 25).cast("string")
    edges = docs.select(
        F.concat(F.lit("https://t"), t, F.lit(".example/")).alias("href"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("click here"))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("page "), t))
        .otherwise(F.lit(""))
        .alias("anchor"),
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
        .alias("src_host"),
    )
    return anchor_stats(edges)


def _q_frontier_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl-frontier construction — the composition the
    crawl side of the library exists for: seed URLs (each planted TWICE
    under a later discovery id — the re-discovery case) ->
    url_dedup_first -> robots_allowed gate (a WILDCARD '/blocked*'
    rule) -> per-host frontier stats joined to pagerank priority over
    the SAME 20-host link graph as pagerank_hosts. Every stage is an
    individually oracle-gated operator; the oracle composes their
    closed forms with the unrolled pagerank CTE chain."""
    from access_log_parser_spark.operators.graph import pagerank
    from access_log_parser_spark.operators.webtext import (
        robots_allowed,
        robots_txt_rules,
        url_dedup_first,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    h = F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"),
                 F.lit(".example"))
    url = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("https://"), h, F.lit("/blocked/p"), k),
    ).otherwise(F.concat(F.lit("https://"), h, F.lit("/p/"), k))
    seeds = docs.select("doc_id", url.alias("url"))
    seeds = seeds.unionByName(
        seeds.select((F.col("doc_id") + 1000000).alias("doc_id"), "url")
    )
    frontier = url_dedup_first(seeds)  # keeps the low-id discovery
    hosts = spark.range(20).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example")).alias("host"),
        F.lit("User-agent: *\nDisallow: /blocked*\n").alias("robots_txt"),
    )
    gated = robots_allowed(frontier.select("url"), robots_txt_rules(hosts))
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 7 + 3) % 20).cast("string"))
        .alias("dst"),
    )
    ranks = pagerank(edges, iterations=3)
    stats = gated.groupBy("host").agg(
        F.sum(F.col("fetch_allowed").cast("int")).cast("bigint")
        .alias("n_allowed"),
        F.sum((~F.col("fetch_allowed")).cast("int")).cast("bigint")
        .alias("n_blocked"),
    )
    return stats.join(
        F.broadcast(ranks),
        stats["host"] == F.concat(ranks["node"], F.lit(".example")),
    ).select("host", "n_allowed", "n_blocked", "rank")


def _q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware fetch timeline (webtext.fetch_schedule): each
    doc seeds one frontier URL on host h(doc_id%20).example; only the
    EVEN hosts carry a Crawl-delay (m/2 + 0.5 s) so the odd hosts
    exercise the default-delay path. Oracle replays the per-host
    row_number window and the exact (position-1)*delay arithmetic."""
    from access_log_parser_spark.operators.webtext import fetch_schedule

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    m = (F.col("doc_id") % 20).cast("string")
    frontier = docs.select(
        F.concat(F.lit("h"), m, F.lit(".example")).alias("host"),
        F.concat(F.lit("https://h"), m, F.lit(".example/p/"), k).alias("url"),
    )
    delays = spark.range(10).select(
        F.concat(F.lit("h"), (F.col("id") * 2).cast("string"),
                 F.lit(".example")).alias("host"),
        (F.col("id").cast("double") + 0.5).alias("crawl_delay"),
    )
    return fetch_schedule(frontier, delays, default_delay=1.0)


def _q_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl change-rate estimation (webtext.change_rate, the Cho &
    Garcia-Molina bias-corrected Poisson estimator): each doc under 300
    becomes a URL visited (doc_id % 6 + 1) times at a per-URL cadence of
    (doc_id % 3 + 1) * 10 ts units, with the content digest rolling over
    every (doc_id % 4 + 1) visits — except doc_id % 7 == 0 URLs, which
    never change (revisit_after NULL, the floor-priority tier). Single-
    visit URLs (doc_id % 6 == 0) exercise the unestimable NULL path.
    Oracle replays the lag window, the interval/change counters, and the
    exact ln((n+0.5)/(n-x+0.5))/(span/n) arithmetic in DuckDB."""
    from access_log_parser_spark.operators.webtext import change_rate

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 300)
    n_visits = (F.col("doc_id") % 6 + 1).cast("int")
    obs = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), n_visits - 1)).alias("v")
    )
    period = F.col("doc_id") % 4 + 1
    observations = obs.select(
        F.concat(
            F.lit("https://ex.com/p/"), F.col("doc_id").cast("string")
        ).alias("url"),
        (F.col("v") * ((F.col("doc_id") % 3 + 1) * 10))
        .cast("double")
        .alias("ts"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("same"))
        .otherwise(
            F.concat(
                F.lit("d"), F.floor(F.col("v") / period).cast("string")
            )
        )
        .alias("digest"),
    )
    return change_rate(observations)


def _q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier calibration (evaluation.threshold_sweep): a
    synthetic score ((doc_id*37) %% 100 / 100) decorrelated from a 1/3-
    positive label (doc_id %% 3 == 0), swept at 5 thresholds — the
    P/R/F1 table a curation pipeline tunes its cutoff from. ONE corpus
    scan, one single-row reduce, unpivot via literal struct array.
    Oracle replays the confusion sums and the exact ratio arithmetic."""
    from access_log_parser_spark.operators.evaluation import threshold_sweep

    docs = _docs_par(spark, sf_dir)
    scored = docs.select(
        ((F.col("doc_id") * 37) % 100 / F.lit(100.0)).alias("score"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("label"),
    )
    return threshold_sweep(scored)


def _q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning (sampling.mixture_budget_plan):
    8 corpus domains (doc_id %% 8) with real token counts; declared
    weights cover d0-d5 plus a domain with NO corpus tokens (d9 — full
    shortfall) while d6/d7 carry tokens but no weight (rate 0). Budget
    50k tokens. Oracle replays the counts, the weight normalizer, and
    the min(1, target/tokens) arithmetic."""
    from access_log_parser_spark.operators.sampling import (
        mixture_budget_plan,
    )

    docs = _docs_par(spark, sf_dir)
    ntok = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    )
    counts = docs.groupBy(
        F.concat(F.lit("d"), (F.col("doc_id") % 8).cast("string"))
        .alias("domain")
    ).agg(F.sum(ntok).cast("long").alias("n_tokens"))
    weights = spark.createDataFrame(
        [("d0", 1.0), ("d1", 2.0), ("d2", 3.0), ("d3", 4.0),
         ("d4", 5.0), ("d5", 6.0), ("d9", 2.0)],
        schema="domain string, weight double",
    )
    return mixture_budget_plan(counts, weights, token_budget=50000.0)


def _q_host_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host corpus profile (webtext.host_profile): the documents
    table spread over 20 hosts (doc_id % 20), with every 9th doc's lang
    NULLed to exercise the 'und' bucket. Majority language, its share,
    token volume and mean doc length per host; oracle replays the
    (host, lang) pre-agg, the frequency-then-lexicographic argmax and
    the rollup."""
    from access_log_parser_spark.operators.webtext import host_profile

    docs = _docs_par(spark, sf_dir)
    pages = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        "text",
        F.when(F.col("doc_id") % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("lang"))
        .alias("lang"),
    )
    return host_profile(pages)


def _q_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication profile (dedup.dup_profile) at 20-token block
    granularity over a corpus where every 7th doc is prefixed with the
    SAME 20-token license block — the planted duplication the report
    must count (plus any natural whole-text dups the synthetic corpus
    carries). Oracle replays the block construction and both scalar
    aggregates."""
    from access_log_parser_spark.operators.dedup import dup_profile

    docs = _docs_par(spark, sf_dir)
    lic = " ".join(f"l{i}" for i in range(1, 21))
    seeded = docs.select(
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(lic + " "), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.col("text"))
        .alias("text")
    )
    return dup_profile(seeded, block_tokens=20)


def _q_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eTLD+1 extraction (webtext.registrable_domain_col, PSL longest-
    match semantics on the built-in suffix subset): six host shapes per
    doc_id % 6 — listed TLD, 2-label suffix (co.uk), private-registry
    suffix (github.io), host-IS-a-suffix (NULL), unlisted TLD (the '*'
    default rule), blogspot private suffix. The oracle is CLOSED-FORM:
    expected domains written per shape, not a replay of the HOF chain."""
    from access_log_parser_spark.operators.webtext import (
        registrable_domain_col,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 600)
    c = F.col("doc_id") % 6
    k = (F.col("doc_id") % 50).cast("string")
    host = (
        F.when(c == 0, F.concat(F.lit("www.site"), k, F.lit(".com")))
        .when(c == 1, F.concat(F.lit("a.b.shop"), k, F.lit(".co.uk")))
        .when(c == 2, F.concat(F.lit("u"), k, F.lit(".github.io")))
        .when(c == 3, F.lit("co.uk"))
        .when(c == 4, F.concat(F.lit("deep.x"), k, F.lit(".zz")))
        .otherwise(F.concat(F.lit("blog"), k, F.lit(".blogspot.com")))
    )
    return docs.select(host.alias("host")).select(
        "host", registrable_domain_col(F.col("host")).alias("domain")
    )


def _q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduling end-to-end: change_rate over the same
    synthetic crawl history as the change_rate query (but with URLs on
    the standard 20 hosts) joined with pagerank host priority over the
    standard 20-host graph; priority = round(rank * change_rate, 6) —
    the classic importance x freshness product (never-changed and
    single-visit URLs fall to priority 0.0, the floor tier). Host comes
    out of the URL with the same regex the operators use; the ranks
    side is broadcast (20 rows). Oracle composes the change-rate replay
    with the unrolled pagerank CTE chain in closed form."""
    from access_log_parser_spark.operators.graph import pagerank
    from access_log_parser_spark.operators.webtext import change_rate

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 300)
    n_visits = (F.col("doc_id") % 6 + 1).cast("int")
    obs = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), n_visits - 1)).alias("v")
    )
    period = F.col("doc_id") % 4 + 1
    observations = obs.select(
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".example/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.col("v") * ((F.col("doc_id") % 3 + 1) * 10))
        .cast("double")
        .alias("ts"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("same"))
        .otherwise(
            F.concat(
                F.lit("d"), F.floor(F.col("v") / period).cast("string")
            )
        )
        .alias("digest"),
    )
    rates = change_rate(observations)

    g = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    edges = g.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
        ).alias("dst"),
    )
    ranks = pagerank(edges, iterations=3)

    host = F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1)
    joined = rates.withColumn("host", host).join(
        F.broadcast(ranks),
        F.col("host") == F.concat(F.col("node"), F.lit(".example")),
    )
    return joined.select(
        "url",
        "host",
        "change_rate",
        "rank",
        F.round(
            F.col("rank") * F.coalesce(F.col("change_rate"), F.lit(0.0)), 6
        ).alias("priority"),
    )


def _q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer et
    al. 2003; fingerprint.winnow_fingerprints): k=5-token Karp-Rabin
    polynomial k-gram hashes, window w=4 minima with the rightmost-min
    tiebreak. The oracle replays tokenization, 32-bit md5 token codes,
    the unrolled degree-4 polynomial and the window selection with
    DuckDB list lambdas — every hash is exact int64 (max value < 2^53,
    no modular reduction anywhere)."""
    from access_log_parser_spark.operators.fingerprint import (
        winnow_fingerprints,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 300)
    return winnow_fingerprints(docs)


def _q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document overlap detection on winnowing fingerprints
    (fingerprint.fingerprint_overlap): pairs sharing >= 2 distinct
    fingerprint hashes, after dropping fingerprints present in > 50
    docs (stop-fingerprint cap). By the winnowing guarantee any shared
    token run of >= w+k-1 = 8 tokens surfaces a shared fingerprint, so
    this catches syndicated spans that whole-doc exact dedup misses.
    Oracle replays the full chain plus the df cap and the pair join."""
    from access_log_parser_spark.operators.fingerprint import (
        fingerprint_overlap,
    )

    docs = _docs_par(spark, sf_dir)
    return fingerprint_overlap(docs, min_shared=2, max_df=50).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("shared_fps").cast("bigint").alias("shared_fps"),
    )


def _q_surt_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT URL canonicalization (webtext.surt_key) — the web-archive
    index key (Common Crawl CDX / pywb). Six URL shapes exercise every
    rule: scheme/host case-fold, one www. strip, default-port drop
    (:443/:80) vs non-default keep (:8080), host-label reversal,
    duplicate-slash collapse, trailing-slash strip, bare-root and
    no-path forms, query-parameter byte sort, fragment removal. The
    oracle is CLOSED FORM (independent per-variant arithmetic, not a
    regex replay), so any drift in the expression chain fails the
    hash."""
    from access_log_parser_spark.operators.webtext import surt_key

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 5).cast("string")
    v = F.col("doc_id") % 6
    url = (
        F.when(v == 0, F.concat(
            F.lit("HTTPS://WWW.EX"), h, F.lit(".COM:443/a/"), k,
            F.lit("?b=2&a=1#frag")))
        .when(v == 1, F.concat(
            F.lit("http://ex"), h, F.lit(".com:8080//a//"), k, F.lit("/")))
        .when(v == 2, F.concat(F.lit("https://sub.ex"), h, F.lit(".org/")))
        .when(v == 3, F.concat(F.lit("http://ex"), h, F.lit(".net")))
        .when(v == 4, F.concat(
            F.lit("https://www.ex"), h, F.lit(".com/p/"), k,
            F.lit("?z=9&y=8&x=7")))
        .otherwise(F.concat(
            F.lit("HTTP://EX"), h, F.lit(".COM:80/q/"), k, F.lit("#x")))
    )
    return docs.select(
        "doc_id", url.alias("url"), surt_key(url).alias("surt")
    )


def _q_cdxj_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ index scan (sources/cdxj.parse_cdxj_lines): each doc becomes
    one index line ``<SURT> <ts14> <JSON>`` built with expressions; one
    doc in 10 is garbage (no 14-digit timestamp) and one in 10 has a
    JSON block missing ``url`` — both must come back valid=false with
    NULL fields and the raw line retained (the reference's
    unmatched-line discipline). ts round-trips through
    to_timestamp/date_format so the timestamp parse is proven without
    timezone-sensitive compares; length/offset arrive as JSON STRINGS
    (pywb convention) and must cast to long."""
    from access_log_parser_spark.sources.cdxj import parse_cdxj_lines

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    k = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 5).cast("string")
    ts14 = F.concat(
        F.lit("20240101"),
        F.lpad((F.col("doc_id") % 24).cast("string"), 2, "0"),
        F.lpad(((F.col("doc_id") * 7) % 60).cast("string"), 2, "0"),
        F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
    )
    surt = F.concat(F.lit("com,ex"), h, F.lit(")/p/"), k)
    js = F.concat(
        F.lit('{"url": "https://ex'), h, F.lit(".com/p/"), k,
        F.lit('", "mime": "text/html", "status": 200, "digest": "sha1:'),
        k,
        F.lit('", "length": "'),
        F.octet_length(F.coalesce(F.col("text"), F.lit(""))).cast("string"),
        F.lit('", "offset": "'), (F.col("doc_id") * 100).cast("string"),
        F.lit('", "filename": "crawl-'),
        (F.col("doc_id") % 10).cast("string"), F.lit('.warc.gz"}'),
    )
    line = (
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.lit("bad line "), k))
        .when(
            F.col("doc_id") % 10 == 5,
            F.concat(surt, F.lit(" "), ts14, F.lit(' {"mime": "x"}')),
        )
        .otherwise(F.concat(surt, F.lit(" "), ts14, F.lit(" "), js))
    )
    out = parse_cdxj_lines(docs.select(line.alias("line")))
    return out.select(
        "surt",
        F.date_format("ts", "yyyyMMddHHmmss").alias("ts14"),
        "url",
        "mime",
        F.col("status").cast("bigint").alias("status"),
        "length",
        "offset",
        "digest",
        "filename",
        "valid",
        "raw",
    )


def _q_bm25_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 topic scoring (retrieval.bm25_score) for the 3-term query
    ['spark','window','merge'] over the whole documents table. The
    oracle replays the exact arithmetic — per-term within-row tf via
    list_filter (no explode), the single-row (N, sum_dl, df_t) corpus
    aggregate, Lucene idf and the k1/b saturation — with every constant
    written symbolically ((1.2 + 1.0), not 2.2) so both engines fold
    the same doubles before the 4-dp round."""
    from access_log_parser_spark.operators.retrieval import bm25_score

    docs = _docs_par(spark, sf_dir)
    return bm25_score(docs, ["spark", "window", "merge"])


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webgraph degree distribution (graph.degree_histogram): a planted
    heavy tail — every 3rd doc links to the single 'hub' node, the rest
    spread over 97 hosts; 11 source hosts. The log2 bins must separate
    the hub's fan-in from the long tail. Oracle replays both degree
    counts and the 2^floor(log2(deg)) binning."""
    from access_log_parser_spark.operators.graph import degree_histogram

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 1000)
    edges = docs.select(
        F.concat(F.lit("s"), (F.col("doc_id") % 11).cast("string"))
        .alias("src"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("hub"))
        .otherwise(
            F.concat(F.lit("h"), (F.col("doc_id") % 97).cast("string"))
        )
        .alias("dst"),
    )
    return degree_histogram(edges)


def _q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion (retrieval.rrf_fuse,
    RRF k=60): fuses the BM25 top-20 for ['spark','window','merge']
    (rank by score DESC, doc_id ASC — TakeOrdered, then a bounded
    20-row window) with the exact-cosine top-20 neighbors of query
    vector vec_id=0 (similarity.cosine_topk, rank on the 6-dp-rounded
    cosine). Exactly two lists, so the fused double sum is
    order-independent (IEEE commutativity) and the oracle replays both
    ranking chains plus the 1/(60+rank) arithmetic bit-for-bit."""
    from pyspark.sql import Window

    from access_log_parser_spark.operators.retrieval import (
        bm25_score,
        rrf_fuse,
    )
    from access_log_parser_spark.operators.similarity import cosine_topk

    docs = _docs_par(spark, sf_dir)
    lex_top = (
        bm25_score(docs, ["spark", "window", "merge"])
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    lex_w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex_ranked = lex_top.select(
        "doc_id", F.row_number().over(lex_w).alias("rank")
    )
    emb = _load(spark, sf_dir, "embeddings")
    sem_ranked = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex_ranked, sem_ranked])


def _q_pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (graph.pagerank) over a deterministic
    20-host graph derived from doc ids (src = doc_id %% 20, dst =
    (7*doc_id+3) %% 20); 3 unrolled power-iteration rounds, oracle
    replays them as chained CTEs with the exact float constants."""
    from access_log_parser_spark.operators.graph import pagerank

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("src"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
        ).alias("dst"),
    )
    return pagerank(edges, iterations=3)


def _q_hits_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS hub/authority scores (graph.hits) over the
    same 20-host graph as pagerank_hosts; the oracle unrolls the
    hub->authority->hub rounds with per-round L1 normalizers."""
    from access_log_parser_spark.operators.graph import hits

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("src"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
        ).alias("dst"),
    )
    return hits(edges, iterations=3)


def _q_trustrank_spam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank + relative spam mass (graph.trustrank/spam_mass) over
    the same 20-host graph as pagerank_hosts with hosts h0-h4 as the
    trusted seed set (S=5); 3 unrolled biased-teleport rounds, spam
    mass computed from the two ROUNDED rank tables so the oracle's
    replay is float-exact."""
    from access_log_parser_spark.operators.graph import (
        pagerank,
        spam_mass,
        trustrank,
    )

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("src"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
        ).alias("dst"),
    )
    seeds = docs.filter(F.col("doc_id") % 20 < 5).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("node")
    )
    pr = pagerank(edges, iterations=3)
    tr = trustrank(edges, seeds, iterations=3)
    return spam_mass(pr, tr)


def _q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link reciprocity (graph.link_reciprocity) over a two-family
    20-host graph (dst1 = 7u+3, dst2 = 3u+1 mod 20 — every host has
    out-degree exactly 2, no self-loops by construction, and exactly
    the hosts u ≡ 2 (mod 5) have their first edge reciprocated), so the
    output exercises 0 / 0.5 reciprocity tiers against the oracle's
    direct EXISTS replay."""
    from access_log_parser_spark.operators.graph import link_reciprocity

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    u = F.col("doc_id") % 20
    e1 = docs.select(
        F.concat(F.lit("h"), u.cast("string")).alias("src"),
        F.concat(F.lit("h"), ((u * 7 + 3) % 20).cast("string")).alias("dst"),
    )
    e2 = docs.select(
        F.concat(F.lit("h"), u.cast("string")).alias("src"),
        F.concat(F.lit("h"), ((u * 3 + 1) % 20).cast("string")).alias("dst"),
    )
    return link_reciprocity(e1.unionByName(e2))


def _q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + clustering coefficients (graph.triangle_counts)
    over the same two-family 20-host graph as link_reciprocity; the
    oracle replays symmetrize -> canonical orientation -> wedge close
    directly in SQL."""
    from access_log_parser_spark.operators.graph import triangle_counts

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    u = F.col("doc_id") % 20
    e1 = docs.select(
        F.concat(F.lit("h"), u.cast("string")).alias("src"),
        F.concat(F.lit("h"), ((u * 7 + 3) % 20).cast("string")).alias("dst"),
    )
    e2 = docs.select(
        F.concat(F.lit("h"), u.cast("string")).alias("src"),
        F.concat(F.lit("h"), ((u * 3 + 1) % 20).cast("string")).alias("dst"),
    )
    return triangle_counts(e1.unionByName(e2))


def _q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-boundary manifest (packing.pack_manifest): documents
    bin-filled into 500-token packs per content-addressed shard; the
    manifest's ordered member ids and token offsets (serialized as
    comma-joined strings for the value-hash compare) must match the
    oracle's window-cumsum replay."""
    from access_log_parser_spark.operators.packing import (
        pack_manifest,
        pack_streaming,
    )
    from access_log_parser_spark.operators.sampling import hash_bucket
    from access_log_parser_spark.operators.text_quality import tokens

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500).select(
        "doc_id",
        F.size(tokens(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("ws_tokens"),
        hash_bucket(F.col("doc_id"), 4).alias("shard"),
        F.col("doc_id").alias("position"),
    )
    packed = pack_streaming(
        docs, budget=500, shard_col="shard",
        order_col="position", token_col="ws_tokens",
    )
    m = pack_manifest(packed)
    as_csv = lambda c: F.array_join(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("string")), ","
    )
    return m.select(
        "shard", "pack_id", "n_docs", "pack_tokens",
        as_csv("doc_ids").alias("doc_ids"),
        as_csv("offsets").alias("offsets"),
    )


def _q_shard_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant per-shard integrity digests
    (sampling.shard_checksums) over the documents table — the manifest
    a shard writer emits so a trainer can verify downloads; the oracle
    replays the md5 row digests and the bit_xor fold."""
    from access_log_parser_spark.operators.sampling import shard_checksums

    return shard_checksums(_docs_par(spark, sf_dir), n_shards=8)


def _q_lang_id_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LID with confidence margin (text_quality.lang_id_margin) — the
    CCNet monolingual-routing gate — over the whole documents table;
    oracle replays the four stopword-hit counts, the list_sort margin
    and the exact lang_id tie-break."""
    from access_log_parser_spark.operators.text_quality import lang_id_margin

    return lang_id_margin(_docs_par(spark, sf_dir))


def _q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-density main-content extraction
    (webtext.main_content_extract) over synthesized pages: every doc is
    wrapped in nav chrome + two prose paragraphs + a related-links block
    + a footer; only the prose must survive. The oracle replays the
    block split, per-block anchor-density scoring and the keep filter
    with DuckDB list lambdas."""
    from access_log_parser_spark.operators.webtext import main_content_extract

    docs = _docs_par(spark, sf_dir)
    h = F.concat(
        F.lit('<html><head><script>nav()</script></head><body>'
              '<div><a href="/">home</a> | <a href="/about">about</a> | '
              '<a href="/contact">contact us</a></div><p>'),
        F.col("text"),
        F.lit('</p><p>a second paragraph of genuine prose content long '
              'enough to clear the bar for doc '),
        F.col("doc_id").cast("string"),
        F.lit('.</p><div>read more: <a href="/a">related story one</a> '
              '<a href="/b">related story two</a></div>'
              '<footer><a href="/tos">terms</a> '
              '<a href="/priv">privacy</a></footer></body></html>'),
    )
    pages = docs.select("doc_id", F.encode(h, "utf-8").alias("html"))
    return main_content_extract(pages)


def _q_near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution to the BEST member: the
    dedup_clusters corpus (three copies per doc) -> HOF MinHash -> LSH
    pairs -> connected components -> cluster_canonical picks the
    argmax-score copy per cluster (synthetic score = doc_id % 7). The
    oracle replays the full chain: recursive-CTE closure + window
    argmax."""
    from access_log_parser_spark.operators.dedup import (
        cluster_canonical,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures_hof,
    )

    base = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )
    corpus = base.unionAll(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).unionAll(base.select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
    pairs = lsh_candidate_pairs(minhash_signatures_hof(corpus), distinct=False)
    assign = connected_components(corpus.select("doc_id"), pairs)
    scored = assign.withColumn("score", (F.col("doc_id") % 7).cast("double"))
    return cluster_canonical(scored, "score")


def _q_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot token-distribution drift
    (text_quality.token_distribution_drift): old = docs 0-249, new =
    docs 250-499, 512 md5 buckets; per-bucket smoothed probabilities
    and KL(new||old) contributions, replayed exactly in DuckDB."""
    from access_log_parser_spark.operators.text_quality import (
        token_distribution_drift,
    )

    docs = _docs_par(spark, sf_dir)
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 500))
    return token_distribution_drift(old, new, buckets=512)


def _q_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction (webtext.page_meta) over synthesized
    payloads: doc_id %% 4 plants a full head (name-first attributes,
    lang="en-US", a newline inside <title> to exercise whitespace
    normalization) / content-first attribute order / a soft-404 title /
    no head at all. The oracle is CLOSED-FORM per variant."""
    from access_log_parser_spark.operators.webtext import page_meta

    docs = _docs_par(spark, sf_dir)
    k = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    body = F.concat(
        F.lit("<body>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</body></html>"),
    )
    h = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<html lang="en-US"><head><title> Doc '), k,
                F.lit("\n overview </title>"
                      '<meta name="description" content="desc '), k,
                F.lit('"><meta property="og:title" content="OG '), k,
                F.lit('"></head>'), body,
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<html><head><meta content="d2 '), k,
                F.lit('" name="description">'
                      '<meta content="og2 '), k,
                F.lit('" property="og:title"><title>T'), k,
                F.lit("</title></head>"), body,
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit('<html lang="en"><head><title>404 Not Found'
                      "</title></head>"), body,
            ),
        )
        .otherwise(F.concat(F.lit("<html>"), body))
    )
    return page_meta(
        docs.select("doc_id", F.encode(h, "utf-8").alias("html"))
    )


def _q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-meta crawl-compliance signals (webtext.robots_meta_signals)
    over synthesized html payloads: doc_id % 4 plants name-first
    noindex+nofollow with a canonical link / content-first nofollow /
    canonical-only / plain — both attribute orders and the indexable
    default all take both branches."""
    from access_log_parser_spark.operators.webtext import robots_meta_signals

    docs = _docs_par(spark, sf_dir)
    k = F.col("doc_id").cast("string")
    h = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit('<html><head><meta name="robots" content="noindex, '
                      'nofollow"><link rel="canonical" '
                      'href="https://canon.example/'),
                k,
                F.lit('"></head><body>'),
                F.col("text"),
                F.lit("</body></html>"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit('<html><head><meta content="nofollow" '
                      'name="robots"></head><body>'),
                F.col("text"),
                F.lit("</body></html>"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit('<html><head><link rel="canonical" '
                      'href="https://canon.example/c'),
                k,
                F.lit('"></head><body>'),
                F.col("text"),
                F.lit("</body></html>"),
            ),
        )
        .otherwise(
            F.concat(F.lit("<html><body>"), F.col("text"),
                     F.lit("</body></html>"))
        )
    )
    pages = docs.select("doc_id", F.encode(h, "utf-8").alias("html"))
    return robots_meta_signals(pages)


def _q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram/unigram LM fluency
    (text_quality.bigram_logprob) over the whole documents table; the
    oracle replays positions, lag, both count tables and the exact
    interpolation constants in DuckDB."""
    from access_log_parser_spark.operators.text_quality import bigram_logprob

    return bigram_logprob(_docs_par(spark, sf_dir))


def _q_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff LM fluency
    (text_quality.trigram_backoff_logprob, Brants et al. 2007) over the
    whole documents table; the oracle replays positions, both lags, the
    three count tables, the bigram-as-context reuse and the 0.4 backoff
    cascade in DuckDB."""
    from access_log_parser_spark.operators.text_quality import (
        trigram_backoff_logprob,
    )

    return trigram_backoff_logprob(_docs_par(spark, sf_dir))


def _q_cross_snapshot_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered exact cross-snapshot dedup
    (dedup.cross_snapshot_dedup_bloom): old snapshot = docs 0-299, new
    crawl = every doc re-keyed +10000 (so 300 re-crawls + 200 new
    pages). The Bloom bitmap of the old fingerprints is built with
    DataFrame bit_or aggregation and probed as a broadcast literal —
    the output is provably identical to the plain anti-join, which is
    exactly what the oracle runs."""
    from access_log_parser_spark.operators.dedup import (
        cross_snapshot_dedup_bloom,
    )

    docs = _docs_par(spark, sf_dir).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 300)
    new = docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    return cross_snapshot_dedup_bloom(new, old)


def _q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token Shannon entropy (text_quality.token_entropy) over
    the whole documents table; oracle replays the ln(n) - sum(c ln c)/n
    identity over the same (doc_id, token) counts."""
    from access_log_parser_spark.operators.text_quality import token_entropy

    return token_entropy(_docs_par(spark, sf_dir))


def _q_label_prop_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (graph.label_propagation) over
    the same 20-host graph as pagerank_hosts, symmetrized; three seed
    hosts (h0=good, h7=spam, h13=news) clamp their labels and spread to
    majority-labeled neighbors for 2 rounds. The oracle unrolls the
    rounds as count/argmax CTEs with the same min-label tiebreak."""
    from access_log_parser_spark.operators.graph import label_propagation

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500)
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
        ).alias("dst"),
    )
    seeds = spark.createDataFrame(
        [("h0", "good"), ("h7", "spam"), ("h13", "news")],
        schema="node string, label string",
    )
    return label_propagation(edges, seeds, iterations=2)


def _q_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (webtext.redirect_resolve): a 400-URL
    redirect map with terminal pages every 5th URL, descending chains
    between them (up to 4 hops), and self-loops at doc_id %% 97 == 13 —
    exercising resolved chains, hop exhaustion, and loops at max_hops=4.
    The oracle unrolls the LEFT-join hops."""
    from access_log_parser_spark.operators.webtext import redirect_resolve

    d = F.col("doc_id")
    redirects = (
        _docs_par(spark, sf_dir)
        .filter(d < 400)
        .select(
            F.concat(F.lit("u"), d.cast("string")).alias("url"),
            F.when(
                d % 97 == 13, F.concat(F.lit("u"), d.cast("string"))
            )
            .when(d % 5 == 0, F.concat(F.lit("f"), d.cast("string")))
            .otherwise(F.concat(F.lit("u"), (d - 1).cast("string")))
            .alias("target"),
        )
    )
    return redirect_resolve(redirects, max_hops=4)


def _q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + control strip + whitespace collapse
    (webtext.normalize_text, the repo's one sanctioned pandas-UDF text
    stage — NFC has no JVM builtin). Every document gets a deterministic
    suffix containing decomposed accents (e+U+0301, A+U+030A), a BEL
    control char, and double spaces, so the oracle's nfc_normalize +
    regexp chain must reproduce real normalization work, not identity."""
    from access_log_parser_spark.operators.webtext import normalize_text

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 500).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" Cafe\u0301  x\x07y  A\u030ab"),
        ).alias("text"),
    )
    return normalize_text(docs)


def _q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining / crawler-trap detection
    (webtext.url_template_mining): 600 URLs over 7 hosts and 3 path
    shapes — numeric ids (/post/<id>/view), 32-hex ids (/s/<md5>/x),
    and a static /about — so the hex-then-digit placeholder rewrite,
    the per-(host,template) distinct counts, and the trap threshold all
    carry signal."""
    from access_log_parser_spark.operators.webtext import (
        url_template_mining,
    )

    d = F.col("doc_id")
    urls = (
        _docs_par(spark, sf_dir)
        .filter(d < 600)
        .select(
            F.concat(
                F.lit("https://h"),
                (d % 7).cast("string"),
                F.lit(".example"),
                F.when(
                    d % 3 == 0,
                    F.concat(
                        F.lit("/post/"), d.cast("string"), F.lit("/view")
                    ),
                )
                .when(
                    d % 3 == 1,
                    F.concat(
                        F.lit("/s/"),
                        F.md5(
                            F.concat(F.lit("x"), d.cast("string"))
                            .cast("binary")
                        ),
                        F.lit("/x"),
                    ),
                )
                .otherwise(F.lit("/about")),
            ).alias("url")
        )
    )
    return url_template_mining(urls, trap_threshold=25)


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL crawl snapshot diff (webtext.snapshot_diff): old = docs
    0-599, new = docs 100-699 with every 10th document's content
    perturbed — so all four statuses (added/removed/changed/unchanged)
    appear and the md5 digests replay exactly in the oracle."""
    from access_log_parser_spark.operators.webtext import snapshot_diff

    d = F.col("doc_id")
    base = _docs_par(spark, sf_dir)
    old = base.filter(d < 600).select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary"))
        .alias("digest"),
    )
    new = base.filter((d >= 100) & (d < 700)).select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.md5(
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.when(d % 10 == 0, F.lit("v2")).otherwise(F.lit("")),
            ).cast("binary")
        ).alias("digest"),
    )
    return snapshot_diff(old, new)


def _q_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between snapshots
    (similarity.centroid_drift): old = vec_id < 250 minus label 3, new =
    the rest minus label 7, so both one-sided labels exercise the NULL
    branch; per-label centroid cosine + L2 at 6 dp. The oracle replays
    the posexplode sum/count mean with generate_subscripts and the
    pairwise math with list HOFs."""
    from access_log_parser_spark.operators.similarity import centroid_drift

    emb = _load(spark, sf_dir, "embeddings")
    old = emb.filter((F.col("vec_id") < 250) & (F.col("label") != 3))
    new = emb.filter((F.col("vec_id") >= 250) & (F.col("label") != 7))
    return centroid_drift(old, new).select(
        F.col("group").cast("int").alias("group"),
        "n_old", "n_new", "cosine", "l2_dist",
    )


def _q_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup (multimodal.dhash_media +
    dhash_near_dup): 300 payloads collapsing onto 60 distinct byte
    strings, so identical-payload pairs surface at hamming 0 through the
    banded pigeonhole join. The pixel grids come from the md5 stub
    (PIL absent), which the oracle replays hex-digit-by-hex-digit, then
    runs the SAME band/xor/bit_count arithmetic — the full dHash math is
    oracle-pinned even though the decode is fake."""
    from access_log_parser_spark.operators.multimodal import (
        dhash_media,
        dhash_near_dup,
    )

    d = F.col("doc_id")
    payloads = (
        _docs_par(spark, sf_dir)
        .filter(d < 300)
        .select(
            d.alias("media_id"),
            F.concat(F.lit("img-"), (d % 60).cast("string"))
            .cast("binary")
            .alias("payload"),
        )
    )
    return dhash_near_dup(
        dhash_media(payloads, "media_id", "payload"), max_hamming=6
    )


def _q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-copy detection (dedup.containment_pairs): docs < 200 plus
    planted prefix copies (doc_id + 10000 carries the first half of the
    original's tokens) — containment ~1.0 where Jaccard would read ~0.5,
    the case the overlap coefficient exists for. Oracle replays the
    prefix construction, the normalized shingling, and the inverted-
    index intersection."""
    from access_log_parser_spark.operators.dedup import containment_pairs

    base = (
        _docs_par(spark, sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    t = F.split(F.col("text"), " ")
    planted = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.array_join(
            F.slice(
                t, 1,
                F.greatest(
                    F.floor(F.size(t) / 2).cast("int"), F.lit(1)
                ),
            ),
            " ",
        ).alias("text"),
    )
    return containment_pairs(base.unionByName(planted), threshold=0.9)


def _q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness gate, batch twin
    (streaming/ratelimit.rate_limit_batch): fetch requests derived from
    events spread over 20 hosts, 300 s minimum spacing; greedy semantics
    (only ALLOWED fetches advance the clock) are window-inexpressible,
    so the oracle replays the per-host walk as a recursive CTE —
    the strongest check a sequential operator can get. floor(epoch(ts))
    matches Spark's truncating long cast on fractional timestamps."""
    from access_log_parser_spark.streaming.ratelimit import rate_limit_batch

    ev = _load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    reqs = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"))
        .alias("host"),
        F.concat(F.lit("u"), F.col("event_id").cast("string")).alias("url"),
        F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
    )
    return rate_limit_batch(reqs, delay_seconds=300)


# --------------------------------------------------------------------------
# round-4b: SRE / traffic analytics over parsed fields (operators/sre.py)
# --------------------------------------------------------------------------

# ALB line variant with a value-derived target_processing_time (the stock
# ALB_LINE pins it to '0.012', which is right for the parse goldens but
# degenerate for latency analytics): 0.000-0.999 s from the event value.
_ALB_LAT_TPT = (
    "concat('0.', lpad(CAST(CAST(FLOOR(value * 100) AS BIGINT) % 1000 "
    "AS STRING), 3, '0'))"
)
_ALB_LAT_FIELDS = list(_ALB_FIELDS)
_ALB_LAT_FIELDS[6] = _ALB_LAT_TPT
ALB_LAT_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "ELSE concat_ws(' ', " + ", ".join(_ALB_LAT_FIELDS) + ") END"
)

# oracle-side latency for matched ALB-lat lines (same three parsed fields)
_LAT_SQL = (
    "CAST(concat('0.00', CAST(event_id % 10 AS VARCHAR)) AS DOUBLE) + "
    "CAST(concat('0.', lpad(CAST(CAST(FLOOR(value * 100) AS BIGINT) % 1000 "
    "AS VARCHAR), 3, '0')) AS DOUBLE) + CAST('0.000' AS DOUBLE)"
)

# CloudFront line variant with a varied x-edge-result-type (stock CF_LINE
# pins 'Hit'): % 4 cycles Hit/Miss/RefreshHit/Error — coprime with the
# % 5 distribution host so every host sees every result type.
_CF_CACHE_FIELDS = list(_CF_FIELDS)
_CF_CACHE_FIELDS[13] = (
    "CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'Hit' WHEN 1 THEN 'Miss' "
    "WHEN 2 THEN 'RefreshHit' ELSE 'Error' END"
)
CF_CACHE_LINE = (
    "CASE WHEN event_id % 10 = 0 THEN concat('GARBAGE-', CAST(event_id AS STRING)) "
    "ELSE concat_ws(chr(9), " + ", ".join(_CF_CACHE_FIELDS) + ") END"
)

# CLF line variant whose request target carries utm_* campaign parameters
# (spliced into the stock CLF request just before the protocol literal):
# event_id % 3 = 1 -> full triple (source exercises +-decode and case
# folding), 2 -> source only (medium/campaign report '-'), 0 -> untagged.
_UTM_SUFFIX = (
    "CASE CAST(event_id % 3 AS INT) "
    "WHEN 1 THEN concat('?utm_source=Src+', CAST(user_id % 3 AS STRING), "
    "'&utm_medium=', CASE CAST(event_id % 2 AS INT) WHEN 0 THEN 'Email' "
    "ELSE 'cpc' END, '&utm_campaign=c', CAST(event_id % 5 AS STRING)) "
    "WHEN 2 THEN concat('?utm_source=s', CAST(user_id % 3 AS STRING)) "
    "ELSE '' END"
)
UTM_CLF_LINE = CLF_LINE.replace(
    "' HTTP/1.1\" '", _UTM_SUFFIX + ", ' HTTP/1.1\" '"
)
assert UTM_CLF_LINE != CLF_LINE  # splice point must exist


def _q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-load-balancer latency percentiles (operators/sre
    .latency_percentiles) over parsed ALB fields: latency = the three
    processing-time captures summed. Exact mode pins the oracle
    (DuckDB quantile_cont — same closest-ranks interpolation as
    Spark's percentile, verified bit-equal); the operator's
    exact=False approx_percentile path is the 100-TB serving shape."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import latency_percentiles

    lines = _event_lines(spark, sf_dir, ALB_LAT_LINE)
    fields = extract_fields(
        lines,
        "alb",
        fields=[
            "elb",
            "request_processing_time",
            "target_processing_time",
            "response_processing_time",
        ],
    ).filter(F.col("pattern_id") >= 0)
    lat = fields.select(
        "elb",
        (
            F.col("request_processing_time").cast("double")
            + F.col("target_processing_time").cast("double")
            + F.col("response_processing_time").cast("double")
        ).alias("latency"),
    )
    return latency_percentiles(lat, "elb", "latency")


def _q_apdex_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex per load balancer (operators/sre.apdex) over the same
    parsed ALB latency; T = 0.25 s puts the synthetic corpus's
    0.012-1.008 s range across all three satisfaction classes."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import apdex

    lines = _event_lines(spark, sf_dir, ALB_LAT_LINE)
    fields = extract_fields(
        lines,
        "alb",
        fields=[
            "elb",
            "request_processing_time",
            "target_processing_time",
            "response_processing_time",
        ],
    ).filter(F.col("pattern_id") >= 0)
    lat = fields.select(
        "elb",
        (
            F.col("request_processing_time").cast("double")
            + F.col("target_processing_time").cast("double")
            + F.col("response_processing_time").cast("double")
        ).alias("latency"),
    )
    return apdex(lat, "elb", "latency", t=0.25)


def _q_error_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-endpoint 5xx rate with Wilson bounds (operators/sre
    .error_rate_wilson) over parsed CLF fields — endpoint = first
    path segment, error = status 500. The oracle replays the
    closed-form interval arithmetic term for term."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import error_rate_wilson

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(
        lines, "apache_clf", fields=["request_uri", "status"]
    ).filter(F.col("pattern_id") >= 0)
    reqs = fields.select(
        F.regexp_extract("request_uri", r"^/([^/]+)", 1).alias("endpoint"),
        (F.col("status") == "500").cast("int").alias("err"),
    )
    return error_rate_wilson(reqs, "endpoint", "err")


def _q_slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn alerting (operators/sre.slo_burn) over
    parsed CLF status + the event timestamp carried through the
    decode as a passthrough column (the parse keeps arbitrary input
    columns alongside the captures). Buckets surface as epoch seconds
    so the oracle stays in integer arithmetic."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import slo_burn

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select("event_id", "ts", F.expr(CLF_LINE).alias("raw"))
    fields = extract_fields(
        lines, "apache_clf", passthrough=["ts"], fields=["status"]
    ).filter(F.col("pattern_id") >= 0)
    reqs = fields.select(
        "ts", (F.col("status") == "500").cast("int").alias("err")
    )
    out = slo_burn(reqs, "ts", "err", slo=0.99, fast_hours=6, slow_hours=24)
    return out.select(
        F.unix_timestamp("bucket").alias("bucket_epoch"),
        "n",
        "errors",
        "fast_burn",
        "slow_burn",
        "alert",
    )


def _q_cache_hit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDN cache efficiency per distribution host (operators/sre
    .cache_report) over parsed CloudFront fields with a varied
    x-edge-result-type; RefreshHit counts as served-from-cache."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import cache_report

    lines = _event_lines(spark, sf_dir, CF_CACHE_LINE)
    fields = extract_fields(
        lines,
        "cloudfront",
        fields=["cs_host", "x_edge_result_type", "sc_bytes"],
    ).filter(F.col("pattern_id") >= 0)
    return cache_report(fields, "cs_host", "x_edge_result_type", "sc_bytes")


def _q_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types per
    user (operators/sre.session_transitions): lag window + one pair
    count; (ts, page) ordering pins ties."""
    from access_log_parser_spark.operators.sre import session_transitions

    ev = _load(spark, sf_dir, "events")
    return session_transitions(ev, "user_id", "ts", "event_type")


def _q_gap_downtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability gaps over 30 minutes per source file
    (operators/sre.gap_windows): the "emitter went quiet" report; one
    lag window on the source key."""
    from access_log_parser_spark.operators.sre import gap_windows

    ev = _load(spark, sf_dir, "events")
    src = ev.select(F.expr(SRC).alias("source"), "ts")
    return gap_windows(src, "source", "ts", min_gap_s=1800)


def _q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain retention cohorts over the event stream
    (operators/sre.retention_cohorts): first-seen-day cohort x active
    day offset user counts."""
    from access_log_parser_spark.operators.sre import retention_cohorts

    ev = _load(spark, sf_dir, "events")
    return retention_cohorts(ev, "user_id", "ts")


def _q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (HRW) shard routing of the document corpus across 8
    shards (operators/sre.rendezvous_shards) plus the stability proof:
    dropping the last shard only moves that shard's keys — the report
    shows n_moved_on_remove_last = n_keys exactly on shard 7, 0
    elsewhere, measured not asserted."""
    from access_log_parser_spark.operators.sre import rendezvous_shards

    docs = _load(spark, sf_dir, "documents")
    return rendezvous_shards(docs, "doc_id", n_shards=8)


def _q_cms_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch accuracy report (operators/sketches
    .cms_vs_exact): every distinct token's exact count vs its d=4,
    w=32 sketch estimate — overshoot is the one-sided CMS error made
    visible. Tokenization matches the vocab_top20 pair (split on
    whitespace after trim)."""
    from access_log_parser_spark.operators.sketches import cms_vs_exact

    docs = _docs_par(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    return cms_vs_exact(toks, "tok", depth=4, width=32)


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog cardinality sketch (operators/sketches
    .hll_registers/hll_estimate/hll_vs_exact): per-event-type m=256
    register table from an md5-derived 60-bit hash, estimated with
    exact-integer indicator sums (no float-accumulation order effects)
    and reported against the exact distinct count. Unlike
    approx_count_distinct, the register TABLE is a first-class
    dataset — storable, max-mergeable across days, oracle-replayable."""
    from access_log_parser_spark.operators.sketches import hll_vs_exact

    ev = _load(spark, sf_dir, "events")
    return hll_vs_exact(ev, "event_id", ["event_type"], b=8)


def _q_latency_percentiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB serving shape of latency_percentiles: exact=False
    switches the aggregate to approx_percentile — a KLL/GK-family
    MERGEABLE sketch with bounded state (the exact percentile holds
    each group's values in the agg buffer; the sketch never ships raw
    values and combines map-side). At accuracy=100000 the rank-error
    bound eps*n < 0.5 for the gate's group sizes, so the sketch answer
    IS the exact lower nearest-rank value (ceil(p*n), pinned empirically
    against Spark) and DuckDB's quantile_disc replays it bit-for-bit —
    the driver gate proves the sketch path itself, closing the r04
    verdict note that only the exact path was oracle-gated."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import latency_percentiles

    lines = _event_lines(spark, sf_dir, ALB_LAT_LINE)
    fields = extract_fields(
        lines,
        "alb",
        fields=[
            "elb",
            "request_processing_time",
            "target_processing_time",
            "response_processing_time",
        ],
    ).filter(F.col("pattern_id") >= 0)
    lat = fields.select(
        "elb",
        (
            F.col("request_processing_time").cast("double")
            + F.col("target_processing_time").cast("double")
            + F.col("response_processing_time").cast("double")
        ).alias("latency"),
    )
    return latency_percentiles(
        lat, "elb", "latency", exact=False, accuracy=100000
    )


def _q_utm_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign attribution from utm_* request parameters
    (operators/referrers.utm_attribution) over parsed CLF request
    URIs: +-decode and case folding on values, '-' for absent
    parameters, untagged rows drop."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.referrers import utm_attribution

    lines = _event_lines(spark, sf_dir, UTM_CLF_LINE)
    fields = extract_fields(
        lines, "apache_clf", fields=["request_uri"]
    ).filter(F.col("pattern_id") >= 0)
    return utm_attribution(fields, "request_uri")


def _q_readability_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (operators/text_quality
    .readability) with the conventional 60/30 difficulty bands; the
    counting grammar (whitespace words, [.!?]+ sentences, vowel-group
    syllables) replays in any regex dialect."""
    from access_log_parser_spark.operators.text_quality import readability

    return readability(_docs_par(spark, sf_dir))


# --------------------------------------------------------------------------
# round-4c: UA structuring, privacy, growth metrics, graph k-core
# --------------------------------------------------------------------------

#: realistic UA strings remapped onto parsed CLF rows by event_id % 8
#: (the bot_signals precedent); class -> (family, os, major) is closed-form
_UA_CLASSES = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.100.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) "
    "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Mobile/15E148 "
    "Safari/604.1",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "curl/8.5.0",
]

#: expected (family, os, major) per class — the oracle's VALUES table;
#: class 7 (curl) carries no OS token -> 'other'
_UA_EXPECT = [
    ("chrome", "windows", 120),
    ("edge", "windows", 120),
    ("safari", "macos", 605),
    ("firefox", "linux", 121),
    ("safari", "ios", 604),
    ("chrome", "android", 120),
    ("bot", "other", None),
    ("bot", "other", None),
]


def _q_ua_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Browser/OS/major-version report (operators/uaparse.ua_breakdown)
    over parsed CLF rows with realistic UA strings remapped by
    event_id %% 8 — the detection-order contract (bot before Edg before
    Chrome before Safari; iOS before the 'like Mac OS X' token it
    carries) is exactly what the 8 classes exercise. The oracle maps
    each class to its closed-form (family, os, major) triple."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.uaparse import ua_breakdown

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(
        lines, "apache_clf", passthrough=["event_id"], fields=["user_agent"]
    ).filter(F.col("pattern_id") >= 0)
    ua = None
    for i, s in enumerate(_UA_CLASSES):
        cond = F.col("event_id") % 8 == i
        ua = F.when(cond, F.lit(s)) if ua is None else ua.when(cond, F.lit(s))
    return ua_breakdown(fields.select(ua.alias("user_agent")))


def _q_ip_anon_kcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR /24 masking with measured k-anonymity (operators/sre
    .ip_anonymize_report): client IPs remapped so every third prefix
    carries at most 2 distinct tails (k_ok false at threshold 5) while
    the rest spread over ~40 — the report must separate them."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import ip_anonymize_report

    lines = _event_lines(spark, sf_dir, CLF_LINE)
    fields = extract_fields(
        lines, "apache_clf", passthrough=["event_id"],
        fields=["remote_host"],
    ).filter(F.col("pattern_id") >= 0)
    e = F.col("event_id")
    tail = F.when(e % 3 == 0, e % 2).otherwise(e % 40)
    ip = F.concat(
        F.lit("10."), (e % 3).cast("string"),
        F.lit("."), (F.col("event_id") % 5).cast("string"),
        F.lit("."), tail.cast("string"),
    )
    return ip_anonymize_report(
        fields.select(ip.alias("client_ip")), "client_ip", k_threshold=5
    )


def _q_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-7-day-WAU / stickiness (operators/sre
    .active_users_rolling) over the event stream."""
    from access_log_parser_spark.operators.sre import active_users_rolling

    ev = _load(spark, sf_dir, "events")
    return active_users_rolling(ev, "user_id", "ts", window_days=7)


def _q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (operators/referrers
    .last_touch_attribution): every third event is campaign-tagged,
    purchases convert; a purchase with no prior touch in its user's
    stream credits organic '-'. Ordered (ts, campaign NULLS FIRST) —
    tie-total and dialect-pinned."""
    from access_log_parser_spark.operators.referrers import (
        last_touch_attribution,
    )

    ev = _load(spark, sf_dir, "events")
    camp = F.when(
        F.col("event_id") % 3 == 1,
        F.concat(F.lit("c"), (F.col("event_id") % 5).cast("string")),
    )
    touches = ev.select(
        "user_id", "ts", camp.alias("campaign"),
        (F.col("event_type") == "purchase").alias("is_conv"),
    )
    return last_touch_attribution(touches, "user_id", "ts", "campaign", "is_conv")


def _q_kcore_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round k=3 core peel (operators/graph.kcore_peel) over a layered
    host graph built to cascade: h0-h4 form a K5 (ring + chords, degree
    6 with fringe attached), each fringe f_k holds degree 3 = two core
    edges + one leaf — so round 1 peels ONLY the leaves, round 2 peels
    the fringe (now degree 2), and round 3 confirms the K5 fixpoint
    (degree 4). A single-round filter would keep the fringe and be
    wrong. The oracle unrolls the rounds as degree/semi-join CTEs.
    Layer index k = (doc_id %% 20) // 4 is independent of the
    doc_id %% 4 class selector by construction."""
    from access_log_parser_spark.operators.graph import kcore_peel

    docs = _docs_par(spark, sf_dir).filter(F.col("doc_id") < 400)
    d = F.col("doc_id")
    m = d % 4
    k = F.floor((d % 20) / 4).cast("int")

    def h(i):
        return F.concat(F.lit("h"), (i % 5).cast("string"))

    def f(i):
        return F.concat(F.lit("f"), (i % 5).cast("string"))

    def leaf(i):
        return F.concat(F.lit("l"), (i % 5).cast("string"))

    src = (
        F.when(m == 0, h(k))
        .when(m == 1, h(k))
        .when(m == 2, f(k))
        .when(d % 8 == 3, f(k))
        .otherwise(leaf(k))
    )
    dst = (
        F.when(m == 0, h(k + 1))
        .when(m == 1, h(k + 2))
        .when(m == 2, h(k))
        .when(d % 8 == 3, h(k + 1))
        .otherwise(f(k))
    )
    edges = docs.select(src.alias("src"), dst.alias("dst"))
    return kcore_peel(edges, k=3, rounds=3)


def _q_latency_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p95 latency regression report per load balancer (operators/sre
    .latency_regression): the ALB-lat corpus split at mid-month; the
    synthetic latency distribution is time-independent, so the pinned
    math reports near-zero deltas and regressed=false — the oracle
    replays the split, both exact quantiles, and the flag."""
    from access_log_parser_spark import extract_fields
    from access_log_parser_spark.operators.sre import latency_regression

    ev = _load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select("event_id", "ts", F.expr(ALB_LAT_LINE).alias("raw"))
    fields = extract_fields(
        lines,
        "alb",
        passthrough=["ts"],
        fields=[
            "elb",
            "request_processing_time",
            "target_processing_time",
            "response_processing_time",
        ],
    ).filter(F.col("pattern_id") >= 0)
    lat = fields.select(
        "elb",
        "ts",
        (
            F.col("request_processing_time").cast("double")
            + F.col("target_processing_time").cast("double")
            + F.col("response_processing_time").cast("double")
        ).alias("latency"),
    )
    import datetime as _dt

    return latency_regression(
        lat, "elb", "latency", "ts",
        split_ts=_dt.datetime(2024, 1, 16), p=0.95, threshold=0.05,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse+route the CLF corpus derived from sf0.001 events,
    enrich per-sink counts — the north_rule pipeline in one DataFrame."""
    return _q_route_counts(spark, "/root/testdata/sf0.001")


#: Driver-gate rotation (round 5, the CLOSING rotation): the driver's
#: CORRECTNESS gate records ~50 rows per round in registry order. The
#: union of the r01-r04 gates covers 150/196 prior names; the 46 below
#: (never driver-gated — waves 3c/4b/4c, all green in every local
#: mirror) go FIRST, followed by the two queries whose code paths
#: changed THIS round (epoch_shuffle's offsets plan, stream_minhash's
#: auto-sized index buckets) and the two round-5 additions — exactly 50,
#: so the r05 gate makes every one of the 198 registry names
#: driver-gated at least once across r01-r05 (VERDICT r04 item #1).
_GATE_FIRST = [
    # -- never driver-gated in r01-r04 --
    "mixture_plan",
    "label_prop_hosts",
    "redirect_chains",
    "text_normalize",
    "url_templates",
    "snapshot_diff",
    "centroid_drift",
    "image_dhash_dedup",
    "containment_dedup",
    "rate_limit_batch",
    "http_status_route",
    "trustrank_spam",
    "link_reciprocity",
    "trigram_backoff",
    "weighted_sample",
    "page_meta",
    "triangle_counts",
    "bot_signals",
    "sitemap_tree",
    "meta_refresh",
    "build_postings",
    "key_skew",
    "ndcg_eval",
    "zscore_spikes",
    "canonical_pick",
    "hreflang_clusters",
    "search_terms",
    "idn_homograph",
    "latency_percentiles",
    "apdex_report",
    "error_wilson",
    "slo_burn_alerts",
    "cache_hit_report",
    "session_transitions",
    "gap_downtime",
    "retention_cohorts",
    "rendezvous_shards",
    "cms_accuracy",
    "utm_attribution",
    "readability_bands",
    "ua_breakdown",
    "ip_anon_kcheck",
    "active_users_rolling",
    "last_touch",
    "kcore_hosts",
    "latency_regression",
    # -- code paths changed in round 5: re-prove under the hard signal --
    "epoch_shuffle",
    "stream_minhash_dedup",
    # -- new in round 5 --
    "hll_distinct",
    "latency_percentiles_kll",
    # -- previously gated, unchanged --
    "json_props_stats",
    "grok_parse",
    "funnel_depth_counts",
    "length_stats_by_source",
    "shard_counts",
    "dedup_replay_batch",
    "multimodal_meta",
    "multimodal_decode",
    "pii_redact",
    "text_repetition",
    "paragraph_dedup",
    "url_host_filter",
    "url_dedup",
    "c4_line_filter",
    "gopher_quality",
    "html_to_text",
    "contamination",
    "ann_ivf",
    "ann_ivf_nprobe",
    "ann_lsh",
    "stream_windowed_counts",
    "stream_paragraph_dedup",
    "stream_hourly_counts",
    "ewma_anomaly_batch",
    "stream_parse_counts",
    "semdedup_join",
    "robots_gate_wildcards",
    "robots_sitemap_urls",
    "robots_crawl_delay",
    "wet_scan",
    "wat_scan",
    "frontier_build",
    "fetch_schedule",
    "block_dedup",
    "winnow_fingerprint",
    "winnow_overlap",
    "surt_key",
    "cdxj_scan",
    "bm25_topic",
    "change_rate",
    "rrf_hybrid",
    "anchor_stats",
    "recrawl_priority",
    "registrable_domain",
    "threshold_sweep",
    "sitemap_entries",
    "warc_to_wet",
    "dup_profile",
    "degree_histogram",
    "host_profile",
    "ann_cosine_topk",
    "warc_scan",
    "semdedup",
    "robots_gate",
    "pagerank_hosts",
    "hits_hosts",
    "sitemap_locs",
    "stratified_topk",
    "extract_links",
    "pack_manifest",
    "shard_checksums",
    "lang_id_margin",
    "main_content",
    "near_dup_keep_best",
    "snapshot_drift",
    "robots_meta",
    "bigram_logprob",
    "cross_snapshot_bloom",
    "dsir_select",
    "keep_best_duplicate",
    "url_spam_score",
    "token_entropy",
    "host_frequency_cap",
    "encoding_signals",
    "quantize_embeddings",
    "cross_snapshot_dedup",
    "perplexity_buckets",
    "curation_v3",
    "domain_quality",
    "linear_quality",
    "script_signals",
    "zorder_key",
    "repeated_ngram_removal",
    "card_signals",
    "temperature_mixture",
    "chunk_documents",
    "asof_enrich_version",
    "range_join_ip_blocks",
    "boilerplate_removal",
    "unigram_logprob",
    "size_histogram",
    "curation_pipeline",
    "curation_v2",
    "vocab_top20",
    "idf_tokens",
    "sample_hash_mod",
    "sample_stratified",
    "pack_streaming",
    "train_holdout_counts",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "sitemap_locs": _q_sitemap_locs,
        "sitemap_tree": _q_sitemap_tree,
        "meta_refresh": _q_meta_refresh,
        "build_postings": _q_build_postings,
        "stratified_topk": _q_stratified_topk,
        "robots_gate": _q_robots_gate,
        "robots_gate_wildcards": _q_robots_gate_wildcards,
        "robots_sitemap_urls": _q_robots_sitemap_urls,
        "robots_crawl_delay": _q_robots_crawl_delay,
        "warc_scan": _q_warc_scan,
        "wet_scan": _q_wet_scan,
        "wat_scan": _q_wat_scan,
        "extract_links": _q_extract_links,
        "frontier_build": _q_frontier_build,
        "fetch_schedule": _q_fetch_schedule,
        "change_rate": _q_change_rate,
        "anchor_stats": _q_anchor_stats,
        "recrawl_priority": _q_recrawl_priority,
        "registrable_domain": _q_registrable_domain,
        "threshold_sweep": _q_threshold_sweep,
        "sitemap_entries": _q_sitemap_entries,
        "warc_to_wet": _q_warc_to_wet,
        "dup_profile": _q_dup_profile,
        "degree_histogram": _q_degree_histogram,
        "host_profile": _q_host_profile,
        "mixture_plan": _q_mixture_plan,
        "label_prop_hosts": _q_label_prop_hosts,
        "redirect_chains": _q_redirect_chains,
        "text_normalize": _q_text_normalize,
        "url_templates": _q_url_templates,
        "snapshot_diff": _q_snapshot_diff,
        "centroid_drift": _q_centroid_drift,
        "image_dhash_dedup": _q_image_dhash_dedup,
        "containment_dedup": _q_containment_dedup,
        "rate_limit_batch": _q_rate_limit,
        "http_status_route": _q_http_status_route,
        "pagerank_hosts": _q_pagerank_hosts,
        "trustrank_spam": _q_trustrank_spam,
        "link_reciprocity": _q_link_reciprocity,
        "triangle_counts": _q_triangle_counts,
        "hits_hosts": _q_hits_hosts,
        "pack_manifest": _q_pack_manifest,
        "shard_checksums": _q_shard_checksums,
        "lang_id_margin": _q_lang_id_margin,
        "main_content": _q_main_content,
        "near_dup_keep_best": _q_near_dup_keep_best,
        "snapshot_drift": _q_snapshot_drift,
        "robots_meta": _q_robots_meta,
        "page_meta": _q_page_meta,
        "bigram_logprob": _q_bigram_logprob,
        "trigram_backoff": _q_trigram_backoff,
        "cross_snapshot_bloom": _q_cross_snapshot_bloom,
        "dsir_select": _q_dsir_select,
        "epoch_shuffle": _q_epoch_shuffle,
        "keep_best_duplicate": _q_keep_best_duplicate,
        "url_spam_score": _q_url_spam_score,
        "token_entropy": _q_token_entropy,
        "parse_clf_fields": _q_parse_clf_fields,
        "parse_s3_fallbacks": _q_parse_s3_fallbacks,
        "parse_ltsv": _q_parse_ltsv,
        "parse_clf_vhost": _q_parse_clf_vhost,
        "parse_nlb_fields": _q_parse_nlb_fields,
        "parse_clb_fields": _q_parse_clb_fields,
        "parse_alb_fields": _q_parse_alb_fields,
        "parse_cloudfront_fields": _q_parse_cloudfront_fields,
        "route_counts": _q_route_counts,
        "filter_dsl": _q_filter_dsl,
        "serialize_ndjson": _q_serialize_ndjson,
        "serialize_kv": _q_serialize_kv,
        "serialize_ltsv_out": _q_serialize_ltsv_out,
        "serialize_pretty_json": _q_serialize_pretty_json,
        "serialize_custom": _q_serialize_custom,
        "serialize_tsv": _q_serialize_tsv,
        "errors_table": _q_errors_table,
        "enrich_broadcast": _q_enrich_broadcast,
        "agg_by_pattern": _q_agg_by_pattern,
        "counters_by_source": _q_counters_by_source,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3_top10": _q_tpch_q3_top10,
        "tpch_q6_selective": _q_tpch_q6_selective,
        "tpch_q5_region_revenue": _q_tpch_q5_region_revenue,
        "tpch_q4_semijoin": _q_tpch_q4_semijoin,
        "tpch_q10_returns": _q_tpch_q10_returns,
        "cumulative_revenue_range": _q_cumulative_revenue_range,
        "distinct_users": _q_distinct_users,
        "orders_per_nation": _q_orders_per_nation,
        "anti_join_reconcile": _q_anti_join_reconcile,
        "skew_two_phase": _q_skew_two_phase,
        "window_running_count": _q_window_running_count,
        "rollup_counts": _q_rollup_counts,
        "event_time_buckets": _q_event_time_buckets,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_lsh_pairs": _q_dedup_lsh_pairs,
        "dedup_lsh_verified": _q_dedup_lsh_verified,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_simhash": _q_dedup_simhash,
        "text_token_count": _q_text_token_count,
        "text_quality": _q_text_quality,
        "text_lang_id": _q_text_lang_id,
        "text_lang_id_ngram": _q_text_lang_id_ngram,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "emb_near_dup": _q_emb_near_dup,
        "sessionize": _q_sessionize,
        "topk_uris": _q_topk_uris,
        "topk_uris_per_source": _q_topk_uris_per_source,
        "bot_signals": _q_bot_signals,
        "key_skew": _q_key_skew,
        "search_terms": _q_search_terms,
        "ndcg_eval": _q_ndcg_eval,
        "zscore_spikes": _q_zscore_spikes,
        "canonical_pick": _q_canonical_pick,
        "hreflang_clusters": _q_hreflang,
        "idn_homograph": _q_idn_homograph,
        "size_histogram": _q_size_histogram,
        "curation_pipeline": _q_curation_pipeline,
        "curation_v2": _q_curation_v2,
        "vocab_top20": _q_vocab_top20,
        "idf_tokens": _q_idf_tokens,
        "sample_hash_mod": _q_sample_hash_mod,
        "sample_stratified": _q_sample_stratified,
        "weighted_sample": _q_weighted_sample,
        "pack_streaming": _q_pack_streaming,
        "train_holdout_counts": _q_train_holdout_counts,
        "json_props_stats": _q_json_props_stats,
        "grok_parse": _q_grok_parse,
        "funnel_depth_counts": _q_funnel_depth_counts,
        "length_stats_by_source": _q_length_stats_by_source,
        "shard_counts": _q_shard_counts,
        "dedup_replay_batch": _q_dedup_replay_batch,
        "multimodal_meta": _q_multimodal_meta,
        "multimodal_decode": _q_multimodal_decode,
        "pii_redact": _q_pii_redact,
        "text_repetition": _q_text_repetition,
        "paragraph_dedup": _q_paragraph_dedup,
        "url_host_filter": _q_url_host_filter,
        "url_dedup": _q_url_dedup,
        "c4_line_filter": _q_c4_line_filter,
        "gopher_quality": _q_gopher_quality,
        "html_to_text": _q_html_to_text,
        "contamination": _q_contamination,
        "ann_ivf": _q_ann_ivf,
        "ann_ivf_nprobe": _q_ann_ivf_nprobe,
        "ann_lsh": _q_ann_lsh,
        "stream_windowed_counts": _q_stream_windowed_counts,
        "stream_paragraph_dedup": _q_stream_paragraph_dedup,
        "stream_hourly_counts": _q_stream_hourly_counts,
        "ewma_anomaly_batch": _q_ewma_anomaly_batch,
        "stream_parse_counts": _q_stream_parse_counts,
        "asof_enrich_version": _q_asof_enrich_version,
        "range_join_ip_blocks": _q_range_join_ip_blocks,
        "boilerplate_removal": _q_boilerplate_removal,
        "unigram_logprob": _q_unigram_logprob,
        "repeated_ngram_removal": _q_repeated_ngram_removal,
        "card_signals": _q_card_signals,
        "temperature_mixture": _q_temperature_mixture,
        "chunk_documents": _q_chunk_documents,
        "zorder_key": _q_zorder_key,
        "stream_minhash_dedup": _q_stream_minhash_dedup,
        "linear_quality": _q_linear_quality,
        "script_signals": _q_script_signals,
        "curation_v3": _q_curation_v3,
        "domain_quality": _q_domain_quality,
        "host_frequency_cap": _q_host_frequency_cap,
        "encoding_signals": _q_encoding_signals,
        "quantize_embeddings": _q_quantize_embeddings,
        "semdedup": _q_semdedup,
        "semdedup_join": _q_semdedup_join,
        "block_dedup": _q_block_dedup,
        "winnow_fingerprint": _q_winnow_fingerprint,
        "winnow_overlap": _q_winnow_overlap,
        "surt_key": _q_surt_key,
        "cdxj_scan": _q_cdxj_scan,
        "bm25_topic": _q_bm25_topic,
        "rrf_hybrid": _q_rrf_hybrid,
        "cross_snapshot_dedup": _q_cross_snapshot_dedup,
        "perplexity_buckets": _q_perplexity_buckets,
        "latency_percentiles": _q_latency_percentiles,
        "apdex_report": _q_apdex_report,
        "error_wilson": _q_error_wilson,
        "slo_burn_alerts": _q_slo_burn_alerts,
        "cache_hit_report": _q_cache_hit_report,
        "session_transitions": _q_session_transitions,
        "gap_downtime": _q_gap_downtime,
        "retention_cohorts": _q_retention_cohorts,
        "rendezvous_shards": _q_rendezvous_shards,
        "cms_accuracy": _q_cms_accuracy,
        "hll_distinct": _q_hll_distinct,
        "latency_percentiles_kll": _q_latency_percentiles_kll,
        "utm_attribution": _q_utm_attribution,
        "readability_bands": _q_readability_bands,
        "ua_breakdown": _q_ua_breakdown,
        "ip_anon_kcheck": _q_ip_anon_kcheck,
        "active_users_rolling": _q_active_users_rolling,
        "last_touch": _q_last_touch,
        "kcore_hosts": _q_kcore_hosts,
        "latency_regression": _q_latency_regression,
    }
    ordered = {k: base[k] for k in _GATE_FIRST}
    ordered.update({k: v for k, v in base.items() if k not in ordered})
    return ordered


# --------------------------------------------------------------------------
# oracles (DuckDB SQL over the pre-registered views)
# --------------------------------------------------------------------------

_CLF_MATCHED = "event_id % 10 <> 0"

_NORM_TEXT = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

_ORACLE: dict[str, str] = {}

_ORACLE["parse_clf_fields"] = f"""
SELECT event_id,
  CASE WHEN {_CLF_MATCHED} THEN 0 ELSE -1 END AS pattern_id,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['remote_host']} END AS remote_host,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['remote_user']} END AS remote_user,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['method']} END AS method,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['request_uri']} END AS request_uri,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['protocol']} END AS protocol,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['status']} END AS status,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['size']} END AS size,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['user_agent']} END AS user_agent
FROM events
"""

_ORACLE["parse_s3_fallbacks"] = """
SELECT event_id,
  CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 4 END AS pattern_id,
  concat('bucket', CAST(event_id % 7 AS STRING)) AS bucket,
  CAST(200 + (event_id % 3) * 100 AS STRING) AS http_status,
  CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) AS bytes_sent,
  concat('vid', CAST(event_id % 13 AS STRING)) AS version_id,
  CASE WHEN event_id % 3 <> 2 THEN 'bucket.s3.amazonaws.com' END AS host_header,
  CASE WHEN event_id % 3 = 0 THEN 'TLSV1.1' END AS tls_version
FROM events
"""

_ORACLE["parse_ltsv"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, value FROM events)
SELECT event_id, 0 AS pos, 'remote_host' AS label,
       concat('192.0.2.', CAST(user_id % 200 AS STRING)) AS value FROM e
UNION ALL
SELECT event_id, 1, 'request', concat('GET /', event_type, ' HTTP/1.1') FROM e
UNION ALL
SELECT event_id, 2, 'status', CAST(200 + (event_id % 4) * 100 AS STRING) FROM e
UNION ALL
SELECT event_id, 3, 'size',
       CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) FROM e
"""

_ORACLE["parse_clf_vhost"] = f"""
SELECT event_id,
  CASE WHEN {_CLF_MATCHED} THEN 0 ELSE -1 END AS pattern_id,
  CASE WHEN {_CLF_MATCHED} THEN concat('vh-', CAST(event_id % 9 AS STRING), '.example.com') END AS virtual_host,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['remote_host']} END AS remote_host,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['status']} END AS status,
  CASE WHEN {_CLF_MATCHED} THEN {CLF_FIELDS['request_uri']} END AS request_uri
FROM events
"""

_ORACLE["parse_nlb_fields"] = f"""
SELECT event_id,
  CASE WHEN {_CLF_MATCHED} THEN 0 ELSE -1 END AS pattern_id,
  CASE WHEN {_CLF_MATCHED} THEN concat('net/lb', CAST(event_id % 3 AS STRING), '/abc') END AS elb,
  CASE WHEN {_CLF_MATCHED} THEN CAST(100 + event_id % 900 AS STRING) END AS received_bytes,
  CASE WHEN {_CLF_MATCHED} THEN CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) END AS sent_bytes,
  CASE WHEN {_CLF_MATCHED} THEN concat('example-', CAST(event_id % 11 AS STRING), '.com') END AS domain_name,
  CASE WHEN {_CLF_MATCHED} THEN concat('ser', CAST(event_id % 7 AS STRING)) END AS chosen_cert_serial
FROM events
"""

_ORACLE["parse_clb_fields"] = f"""
SELECT event_id,
  CASE WHEN event_id % 10 = 0 THEN -1
       WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS pattern_id,
  CASE WHEN {_CLF_MATCHED} THEN concat('my-lb', CAST(event_id % 3 AS STRING)) END AS elb,
  CASE WHEN {_CLF_MATCHED} THEN CAST(200 + (event_id % 4) * 100 AS STRING) END AS elb_status_code,
  CASE WHEN {_CLF_MATCHED} THEN CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) END AS sent_bytes,
  CASE WHEN {_CLF_MATCHED} THEN concat('/', event_type, '/', CAST(event_id AS STRING)) END AS request_uri,
  CASE WHEN event_id % 10 <> 0 AND event_id % 2 = 0
       THEN concat('ua/', CAST(event_id % 7 AS STRING)) END AS user_agent,
  CASE WHEN event_id % 10 <> 0 AND event_id % 2 = 0
       THEN 'TLSv1.2' END AS ssl_protocol
FROM events
"""

_ORACLE["parse_alb_fields"] = f"""
SELECT event_id,
  CASE WHEN {_CLF_MATCHED} THEN 0 ELSE -1 END AS pattern_id,
  CASE WHEN {_CLF_MATCHED} THEN CAST(200 + (event_id % 4) * 100 AS STRING) END AS elb_status_code,
  CASE WHEN {_CLF_MATCHED} THEN CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) END AS sent_bytes,
  CASE WHEN {_CLF_MATCHED} THEN concat('/', event_type, '/', CAST(event_id AS STRING)) END AS request_uri,
  CASE WHEN {_CLF_MATCHED} THEN concat('example-', CAST(event_id % 11 AS STRING), '.com') END AS domain_name,
  CASE WHEN {_CLF_MATCHED} THEN '200' END AS target_status_code_list
FROM events
"""

_ORACLE["parse_cloudfront_fields"] = f"""
SELECT event_id,
  CASE WHEN {_CLF_MATCHED} THEN 0 ELSE -1 END AS pattern_id,
  CASE WHEN {_CLF_MATCHED} THEN concat('LAX', CAST(event_id % 3 AS STRING)) END AS x_edge_location,
  CASE WHEN {_CLF_MATCHED} THEN CAST(200 + (event_id % 4) * 100 AS STRING) END AS sc_status,
  CASE WHEN {_CLF_MATCHED} THEN concat('/', event_type, '/', CAST(event_id AS STRING)) END AS cs_uri_stem,
  CASE WHEN {_CLF_MATCHED} THEN CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) END AS sc_bytes,
  CASE WHEN {_CLF_MATCHED} THEN 'HTTP/2.0' END AS cs_protocol_version
FROM events
"""

_ORACLE["serialize_pretty_json"] = """
SELECT CAST(event_id AS STRING) AS source,
  concat('{', chr(10),
   '  "remote_host": "192.0.2.', CAST(user_id % 200 AS STRING), '",', chr(10),
   '  "request": "GET /', event_type, ' HTTP/1.1",', chr(10),
   '  "status": "', CAST(200 + (event_id % 4) * 100 AS STRING), '",', chr(10),
   '  "size": "', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING), '"', chr(10),
   '}') AS out_line
FROM events
"""

_ORACLE["serialize_custom"] = """
SELECT CAST(event_id AS STRING) AS source,
  concat('remote_host=192.0.2.', CAST(user_id % 200 AS STRING),
   '|request=GET /', event_type, ' HTTP/1.1',
   '|status=', CAST(200 + (event_id % 4) * 100 AS STRING),
   '|size=', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING)) AS out_line
FROM events
"""

_ORACLE["serialize_kv"] = """
SELECT CAST(event_id AS STRING) AS source,
  concat('remote_host="192.0.2.', CAST(user_id % 200 AS STRING),
   '" request="GET /', event_type, ' HTTP/1.1',
   '" status="', CAST(200 + (event_id % 4) * 100 AS STRING),
   '" size="', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING),
   '"') AS out_line
FROM events
"""

_ORACLE["serialize_ltsv_out"] = """
SELECT CAST(event_id AS STRING) AS source,
  concat('remote_host:192.0.2.', CAST(user_id % 200 AS STRING), chr(9),
   'request:GET /', event_type, ' HTTP/1.1', chr(9),
   'status:', CAST(200 + (event_id % 4) * 100 AS STRING), chr(9),
   'size:', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING)) AS out_line
FROM events
"""

_ORACLE["serialize_tsv"] = """
SELECT CAST(event_id AS STRING) AS source,
  concat('remote_host', chr(9), 'request', chr(9), 'status', chr(9), 'size',
   chr(10),
   '192.0.2.', CAST(user_id % 200 AS STRING), chr(9),
   'GET /', event_type, ' HTTP/1.1', chr(9),
   CAST(200 + (event_id % 4) * 100 AS STRING), chr(9),
   CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING)) AS out_line
FROM events
"""

# route_counts semantics: skip line_no==1 (event_id<20) BEFORE decode;
# garbage -> unmatched; filter status==200 (event_id%4==0) else excluded.
_ORACLE["route_counts"] = """
WITH tagged AS (
  SELECT CASE
    WHEN event_id < 20 THEN 'skipped'
    WHEN event_id % 10 = 0 THEN 'unmatched'
    WHEN event_id % 4 = 0 THEN 'matched'
    ELSE 'excluded' END AS status,
  CASE
    WHEN event_id < 20 THEN -1
    WHEN event_id % 10 = 0 THEN -1
    ELSE 0 END AS pattern_id
  FROM events)
SELECT status, pattern_id, COUNT(*) AS n_rows FROM tagged GROUP BY 1, 2
"""

_ORACLE["filter_dsl"] = """
SELECT event_id,
  CAST(200 + (event_id % 4) * 100 AS STRING) AS status,
  CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING) AS size
FROM events
WHERE event_id % 10 <> 0
  AND CAST(FLOOR(value * 100) AS BIGINT) >= 50
  AND 200 + (event_id % 4) * 100 < 400
"""

_ORACLE["serialize_ndjson"] = """
SELECT CAST(event_id AS STRING) AS source,
  concat('{"remote_host":"192.0.2.', CAST(user_id % 200 AS STRING),
   '","request":"GET /', event_type, ' HTTP/1.1',
   '","status":"', CAST(200 + (event_id % 4) * 100 AS STRING),
   '","size":"', CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING),
   '"}') AS out_line
FROM events
"""

_ORACLE["errors_table"] = f"""
SELECT {SRC} AS entry, {LINE_NO} AS line_number,
       concat('GARBAGE-', CAST(event_id AS STRING)) AS line
FROM events WHERE event_id % 10 = 0
"""

_ORACLE["enrich_broadcast"] = f"""
SELECT event_id,
  {CLF_FIELDS['remote_host']} AS remote_host,
  n.n_name AS n_name
FROM events e LEFT JOIN nation n ON e.event_id % 25 = n.n_nationkey
WHERE {_CLF_MATCHED}
"""

_ORACLE["agg_by_pattern"] = """
SELECT CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 4 END AS pattern_id,
       COUNT(*) AS n_rows
FROM events GROUP BY 1
"""

_ORACLE["counters_by_source"] = f"""
SELECT {SRC} AS source,
  COUNT(*) AS total,
  CAST(SUM(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS matched,
  CAST(SUM(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS unmatched,
  CAST(0 AS BIGINT) AS excluded, CAST(0 AS BIGINT) AS skipped
FROM events GROUP BY 1
"""

_ORACLE["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
  COUNT(*) AS count_order
FROM lineitem GROUP BY 1, 2
"""

_ORACLE["tpch_q3_top10"] = """
SELECT l_orderkey,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O'
GROUP BY 1 ORDER BY revenue_c DESC, l_orderkey ASC LIMIT 10
"""

_ORACLE["tpch_q6_selective"] = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

_ORACLE["tpch_q5_region_revenue"] = """
SELECT r_name,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""

_ORACLE["tpch_q4_semijoin"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate >= '1996-01-01')
GROUP BY 1
"""

_ORACLE["tpch_q10_returns"] = """
WITH agg AS (
  SELECT c_custkey, c_name, n_name,
    CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_c DESC, c_custkey ASC) AS rank
  FROM agg
)
SELECT c_custkey, c_name, n_name, revenue_c, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 20
"""

_ORACLE["cumulative_revenue_range"] = """
SELECT l_orderkey, l_linenumber, l_returnflag,
  CAST(l_shipdate AS STRING) AS ship_date,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) OVER (
    PARTITION BY l_returnflag ORDER BY l_shipdate
    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_revenue_c
FROM lineitem WHERE l_orderkey < 2000
"""

_ORACLE["distinct_users"] = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY 1
"""

_ORACLE["orders_per_nation"] = """
SELECT n_name, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""

_ORACLE["anti_join_reconcile"] = """
SELECT event_id, concat('GARBAGE-', CAST(event_id AS STRING)) AS raw
FROM events WHERE event_id % 10 = 0
"""

_ORACLE["skew_two_phase"] = f"""
SELECT {SRC} AS source, COUNT(*) AS n_lines FROM events GROUP BY 1
"""

_ORACLE["window_running_count"] = f"""
SELECT event_id, {SRC} AS source, {LINE_NO} AS line_no,
  ROW_NUMBER() OVER (PARTITION BY {SRC} ORDER BY {LINE_NO}) AS running_matched
FROM events WHERE {_CLF_MATCHED}
"""

_ORACLE["rollup_counts"] = """
WITH tagged AS (
  SELECT CASE WHEN event_id % 10 = 0 THEN 'unmatched' ELSE 'matched' END AS status,
         CASE WHEN event_id % 10 = 0 THEN -1 ELSE 0 END AS pattern_id
  FROM events)
SELECT status, pattern_id, COUNT(*) AS n_rows
FROM tagged GROUP BY ROLLUP(status, pattern_id)
"""

_ORACLE["stream_parse_counts"] = """
SELECT CASE WHEN event_id % 10 = 0 THEN 'unmatched' ELSE 'matched' END AS status,
  CASE WHEN event_id % 10 = 0 THEN -1 ELSE 0 END AS pattern_id,
  COUNT(*) AS n_rows
FROM events GROUP BY 1, 2
"""

# EWMA recurrence re-derived with a recursive CTE. Float-critical: the
# smoothing term is written (1 - 0.3), NOT 0.7 — the doubles differ in
# the last bit and the recurrence would drift from ewma_step's
# alpha*c + (1-alpha)*e.
_ORACLE["ewma_anomaly_batch"] = """
WITH RECURSIVE counts AS (
  SELECT event_type AS source,
    strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
    COUNT(*) AS batch_count
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT source, hour, batch_count,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hour) AS i
  FROM counts
), rec AS (
  SELECT source, i, hour, batch_count,
    0.0::DOUBLE AS ewma_before,
    CAST(batch_count AS DOUBLE) AS ewma_after
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.source, s.i, s.hour, s.batch_count,
    r.ewma_after,
    0.3 * s.batch_count + (1 - 0.3) * r.ewma_after
  FROM seq s JOIN rec r ON s.source = r.source AND s.i = r.i + 1
)
SELECT source, hour, batch_count,
  ROUND(ewma_before, 6) AS ewma_before,
  (i > 2 AND ewma_before > 0
   AND (batch_count > 3 * ewma_before OR batch_count < ewma_before / 3))
  AS is_anomaly
FROM rec
"""

# the streaming complete-mode aggregation must equal the same batch SQL
_ORACLE["stream_hourly_counts"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events GROUP BY 1, 2
"""

_ORACLE["event_time_buckets"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events GROUP BY 1, 2
"""

_ORACLE["dedup_exact"] = f"""
SELECT doc_id, md5({_NORM_TEXT}) AS fp FROM documents
"""

# MinHash oracle: shingle -> 60-bit md5 int -> min((a*h+b) mod 2^61-1).
# Shingles: distinct word 3-grams of normalized text (positions 1..n-2).
_MH = "CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)"


def _mh_sql(i: int, a: int, b: int) -> str:
    return (
        f"MIN(({a}::HUGEINT * {_MH} + {b}) % 2305843009213693951)::BIGINT AS mh_{i}"
    )


_ORACLE["dedup_minhash_lsh"] = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
    concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
)
SELECT doc_id, {_mh_sql(0, 3, 7919)}, {_mh_sql(7, 17, 63352)}, {_mh_sql(15, 33, 126704)}
FROM grams GROUP BY doc_id
"""

# full-width (k=16) signature + 4-band LSH join, same formula as
# dedup_minhash_lsh (a_i = 2i+3, b_i = 7919*(i+1))
_MH_ALL = ", ".join(_mh_sql(i, 2 * i + 3, 7919 * (i + 1)) for i in range(16))
_BAND_SELECTS = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band_idx, md5(concat_ws(',', {cols})) AS band_key FROM sig".format(
        b=b,
        cols=", ".join(f"CAST(mh_{i} AS STRING)" for i in range(4 * b, 4 * b + 4)),
    )
    for b in range(4)
)

_ORACLE["dedup_lsh_verified"] = f"""
WITH base AS (
  SELECT doc_id, {_NORM_TEXT} AS norm FROM documents WHERE doc_id < 100
), corpus AS (
  SELECT doc_id, norm FROM base
  UNION ALL SELECT doc_id + 100000, norm FROM base
), toks AS (
  SELECT doc_id, string_split(norm, ' ') AS t FROM corpus
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig AS (
  SELECT doc_id, {_MH_ALL}
  FROM grams GROUP BY doc_id
), bands AS (
  {_BAND_SELECTS}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), gl AS (
  SELECT doc_id, list(g) AS gs FROM grams GROUP BY 1
), verified AS (
  SELECT c.id_a, c.id_b,
    ROUND(CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
      / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs))), 6) AS jaccard
  FROM cand c
  JOIN gl ga ON ga.doc_id = c.id_a
  JOIN gl gb ON gb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.5
"""

_ORACLE["dedup_lsh_pairs"] = f"""
WITH base AS (
  SELECT doc_id, {_NORM_TEXT} AS norm FROM documents WHERE doc_id < 100
), corpus AS (
  SELECT doc_id, norm FROM base
  UNION ALL SELECT doc_id + 100000, norm FROM base
), toks AS (
  SELECT doc_id, string_split(norm, ' ') AS t FROM corpus
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig AS (
  SELECT doc_id, {_MH_ALL}
  FROM grams GROUP BY doc_id
), bands AS (
  {_BAND_SELECTS}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""

_ORACLE["dedup_clusters"] = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, {_NORM_TEXT} AS norm FROM documents WHERE doc_id < 50
), corpus AS (
  SELECT doc_id, norm FROM base
  UNION ALL SELECT doc_id + 100000, norm FROM base
  UNION ALL SELECT doc_id + 200000, norm FROM base
), toks AS (
  SELECT doc_id, string_split(norm, ' ') AS t FROM corpus
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig AS (
  SELECT doc_id, {_MH_ALL}
  FROM grams GROUP BY doc_id
), bands AS (
  {_BAND_SELECTS}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY 1
"""

_ORACLE["dedup_ngram_jaccard"] = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t
  FROM documents WHERE doc_id < 200
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.2
"""

_ORACLE["dedup_simhash"] = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split({_NORM_TEXT}, ' ')) AS tok
  FROM documents WHERE doc_id < 200
), h AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) & 4294967295 AS h32
  FROM toks
), bits AS (
  SELECT doc_id, j,
    SUM(CASE WHEN (h32 >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, UNNEST(generate_series(0, 31)) AS jj(j)
  GROUP BY 1, 2
)
SELECT doc_id,
  CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY 1
"""

_ORACLE["text_token_count"] = r"""
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS re_tokens
FROM documents
"""

_SW_EN = "['the','and','of','to','a','in','is','it','that','for']"

_ORACLE["text_quality"] = rf"""
WITH base AS (
  SELECT doc_id, text,
    length(text) AS n_chars,
    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS punct,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW_EN})) AS hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  ROUND((n_chars - n_tokens + 1) / n_tokens, 6) AS mean_token_len,
  ROUND(punct / n_chars, 6) AS punct_ratio,
  hits AS stopword_hits,
  ROUND(LEAST(1.0, hits / 10.0) * 0.5
    + CASE WHEN (n_chars - n_tokens + 1) / n_tokens >= 3
            AND (n_chars - n_tokens + 1) / n_tokens <= 10 THEN 0.3 ELSE 0.0 END
    + CASE WHEN punct / n_chars < 0.1 THEN 0.2 ELSE 0.0 END, 6) AS quality
FROM base
"""

_SW = {
    "en": _SW_EN,
    "de": "['der','die','das','und','ist','nicht','ein','mit','zu','auf']",
    "fr": "['le','la','les','et','est','un','une','dans','pour','que']",
    "es": "['el','la','los','y','es','un','una','en','para','que']",
}

_ORACLE["text_lang_id"] = rf"""
WITH hits AS (
  SELECT doc_id,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['en']})) AS h_en,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['de']})) AS h_de,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['fr']})) AS h_fr,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['es']})) AS h_es
  FROM documents
)
SELECT doc_id,
  CASE
    WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
    WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
    WHEN h_en >= h_de THEN 'en'
    ELSE 'de' END AS pred_lang,
  GREATEST(h_en, h_de, h_fr, h_es) AS pred_hits
FROM hits
"""

_TRIGRAMS = {
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of", "of "],
    "de": ["der", "er ", " de", "ich", "ch ", "ein", " ei", "und", " un", "nd "],
    "fr": [" le", "le ", "es ", " de", "de ", "ent", "nt ", "que", " qu", "ue "],
    "es": [" de", "de ", "os ", " la", "la ", "que", " qu", "ue ", "ión", "el "],
}


def _tg_list(lang: str) -> str:
    return "[" + ", ".join("'" + g.replace("'", "''") + "'" for g in _TRIGRAMS[lang]) + "]"


_ORACLE["text_lang_id_ngram"] = f"""
WITH t AS (
  SELECT doc_id, lower(text) AS t FROM documents
), grams AS (
  SELECT doc_id, list_distinct(
    [substr(t, CAST(i AS INT), 3) FOR i IN generate_series(1, GREATEST(length(t) - 2, 1))]
  ) AS gs
  FROM t
), hits AS (
  SELECT doc_id,
    len(list_intersect(gs, {_tg_list('en')})) AS h_en,
    len(list_intersect(gs, {_tg_list('de')})) AS h_de,
    len(list_intersect(gs, {_tg_list('fr')})) AS h_fr,
    len(list_intersect(gs, {_tg_list('es')})) AS h_es
  FROM grams
)
SELECT doc_id,
  CASE
    WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
    WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
    WHEN h_en >= h_de THEN 'en'
    ELSE 'de' END AS pred_lang,
  GREATEST(h_en, h_de, h_fr, h_es) AS pred_hits
FROM hits
"""

_ORACLE["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_dot_product(q.qv, c.embedding::DOUBLE[])
      / (sqrt(list_dot_product(q.qv, q.qv))
         * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

_ORACLE["ann_ivf"] = """
WITH cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 3
), assigned AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
    (SELECT cid FROM cents
     ORDER BY list_dot_product(cv, e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell
  FROM embeddings e
), q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM assigned WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.qv, a.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))), 6) AS cos
  FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

_ORACLE["emb_near_dup"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
           FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v)
  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
"""

_ORACLE["sessionize"] = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id,
    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no, COUNT(*) AS n_events,
  MIN(event_id) AS first_event, MAX(event_id) AS last_event
FROM s GROUP BY 1, 2
"""

_ORACLE["topk_uris"] = f"""
SELECT {CLF_FIELDS['request_uri']} AS request_uri, COUNT(*) AS hits
FROM events WHERE {_CLF_MATCHED}
GROUP BY 1 ORDER BY hits DESC, request_uri ASC LIMIT 10
"""

_ORACLE["topk_uris_per_source"] = f"""
WITH counts AS (
  SELECT {SRC} AS source, {CLF_FIELDS['request_uri']} AS request_uri,
    COUNT(*) AS hits
  FROM events WHERE {_CLF_MATCHED}
  GROUP BY 1, 2
), ranked AS (
  SELECT source, request_uri, hits,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY hits DESC, request_uri ASC) AS INT) AS rk
  FROM counts
)
SELECT source, request_uri, hits, rk FROM ranked WHERE rk <= 3
"""

_ORACLE["size_histogram"] = f"""
SELECT CAST(FLOOR(log2(CAST(FLOOR(value * 100) AS BIGINT) + 1)) AS INT) AS size_bucket,
  COUNT(*) AS n_lines
FROM events WHERE {_CLF_MATCHED} GROUP BY 1
"""

_ORACLE["curation_pipeline"] = rf"""
WITH feats AS (
  SELECT doc_id, source,
    ROUND(LEAST(1.0, len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['en']})) / 10.0) * 0.5
      + CASE WHEN (length(text) - len(regexp_split_to_array(trim(text), '\s+')) + 1)
                  / len(regexp_split_to_array(trim(text), '\s+')) >= 3
              AND (length(text) - len(regexp_split_to_array(trim(text), '\s+')) + 1)
                  / len(regexp_split_to_array(trim(text), '\s+')) <= 10 THEN 0.3 ELSE 0.0 END
      + CASE WHEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                  / length(text) < 0.1 THEN 0.2 ELSE 0.0 END, 6) AS quality,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['en']})) AS h_en,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['de']})) AS h_de,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['fr']})) AS h_fr,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['es']})) AS h_es,
    md5({_NORM_TEXT}) AS fp
  FROM documents
), gated AS (
  SELECT * FROM feats
  WHERE quality >= 0.5 AND
    (CASE WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
          WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
          WHEN h_en >= h_de THEN 'en' ELSE 'de' END) = 'en'
), kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM gated
)
SELECT source, COUNT(*) AS n_kept FROM kept WHERE rn = 1 GROUP BY 1
"""

_ORACLE["vocab_top20"] = r"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents
)
SELECT token, COUNT(*) AS freq FROM toks
GROUP BY 1 ORDER BY freq DESC, token ASC LIMIT 20
"""

_ORACLE["idf_tokens"] = r"""
WITH per_doc AS (
  SELECT DISTINCT doc_id,
    UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
), dfreq AS (
  SELECT token, COUNT(*) AS doc_freq FROM per_doc GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT token, doc_freq,
  ROUND(ln((n_docs + 1) / (doc_freq + 1)), 6) AS idf
FROM dfreq, n WHERE doc_freq >= 5
"""

_ORACLE["sample_hash_mod"] = """
SELECT doc_id, source FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8) AS BIGINT) % 20 = 0
"""

_ORACLE["sample_stratified"] = """
WITH r AS (
  SELECT source, doc_id,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
  FROM documents)
SELECT source, doc_id FROM r WHERE rn <= 5
"""

_ORACLE["pack_streaming"] = """
WITH d AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8) AS BIGINT) % 8 AS shard,
    n_chars
  FROM documents
)
SELECT doc_id, shard,
  CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
    PARTITION BY shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 5000) AS BIGINT) AS pack_id
FROM d
"""

_ORACLE["train_holdout_counts"] = """
SELECT CASE
    WHEN CAST('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8) AS BIGINT) % 100 = 0
    THEN 'holdout' ELSE 'train' END AS split,
  COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""

_ORACLE["json_props_stats"] = """
WITH e AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT k % 10 AS k_bucket, COUNT(*) AS n_events,
  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM e GROUP BY 1
"""

_ORACLE["grok_parse"] = """
SELECT event_id, 0 AS pattern_id,
  CASE WHEN event_id % 4 = 0 THEN 'ERROR' ELSE 'INFO' END AS level,
  concat('192.0.2.', CAST(user_id % 200 AS STRING)) AS ip,
  CAST(200 + (event_id % 4) * 100 AS STRING) AS status,
  concat(event_type, '-', CAST(event_id AS STRING)) AS msg
FROM events
"""

_ORACLE["funnel_depth_counts"] = """
WITH ev AS (SELECT * FROM events WHERE event_id < 500),
v AS (
  SELECT user_id, MIN(event_id) AS e_view FROM ev
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.event_id) AS e_click
  FROM ev e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.event_id > v.e_view GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.event_id) AS e_purchase
  FROM ev e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.event_id > c.e_click GROUP BY 1
), users AS (SELECT DISTINCT user_id FROM ev)
SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth,
  COUNT(*) AS n_users
FROM users
LEFT JOIN v ON users.user_id = v.user_id
LEFT JOIN c ON users.user_id = c.user_id
LEFT JOIN p ON users.user_id = p.user_id
GROUP BY 1
"""

_ORACLE["length_stats_by_source"] = """
WITH ranked AS (
  SELECT source, n_chars,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
), med AS (
  SELECT source, n_chars AS median_chars FROM ranked
  WHERE rn = CAST(FLOOR((n - 1) / 2) AS BIGINT) + 1
), stats AS (
  SELECT source, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
         MAX(n_chars) AS max_chars, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1
)
SELECT stats.source, n_docs, min_chars, max_chars, sum_chars, median_chars
FROM stats JOIN med ON stats.source = med.source
"""

_ORACLE["shard_counts"] = """
SELECT CAST('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8) AS BIGINT) % 8 AS shard,
  COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""

_ORACLE["dedup_replay_batch"] = """
SELECT DISTINCT event_id, event_type
FROM (SELECT event_id, event_type FROM events
      UNION ALL SELECT event_id, event_type FROM events)
"""

_ORACLE["multimodal_meta"] = """
SELECT doc_id AS media_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS digest
FROM documents
"""


from access_log_parser_spark.operators.webtext import (  # noqa: E402
    EMAIL_RE as _EMAIL_RE,
    IPV4_RE as _IPV4_RE,
    PHONE_RE as _PHONE_RE,
)

_PII_SEED = """
  text || CASE CAST(doc_id % 3 AS INT)
    WHEN 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com now')
    WHEN 1 THEN concat(' from 192.0.2.', CAST(doc_id % 256 AS STRING), ' today')
    ELSE concat(' call +49151', CAST(1000000 + doc_id AS STRING)) END
"""

_ORACLE["pii_redact"] = f"""
WITH seeded AS (SELECT doc_id, {_PII_SEED} AS text FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_IPV4_RE}', '<IP>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS INT) AS n_ips,
  CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones
FROM seeded
"""

_ORACLE["text_repetition"] = f"""
WITH toks AS (SELECT doc_id,
    list_slice(string_split({_NORM_TEXT}, ' '), 1, 10000) AS t FROM documents),
g AS (
  SELECT doc_id, t,
    CASE WHEN len(t) >= 2 THEN
      list_transform(generate_series(1, len(t) - 1), i -> concat(t[i], ' ', t[i+1]))
    ELSE []::VARCHAR[] END AS g2,
    CASE WHEN len(t) >= 3 THEN
      list_transform(generate_series(1, len(t) - 2), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
    ELSE []::VARCHAR[] END AS g3
  FROM toks)
SELECT doc_id,
  CAST(len(t) AS INT) AS n_tokens,
  CASE WHEN len(t) = 0 THEN 0.0 ELSE
    ROUND(1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) END AS dup_word_frac,
  CASE WHEN len(g2) = 0 THEN 0.0 ELSE
    ROUND(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) END AS dup_2gram_frac,
  CASE WHEN len(g3) = 0 THEN 0.0 ELSE
    ROUND(1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) END AS dup_3gram_frac,
  ROUND(CAST(list_max(list_transform(list_distinct(t),
        w -> len(list_filter(t, x -> x = w)))) AS DOUBLE)
        / GREATEST(len(t), 1), 6) AS top_word_frac
FROM g
"""

_ORACLE["paragraph_dedup"] = """
WITH d AS (
  SELECT doc_id % 50 AS page_id, CAST(FLOOR(doc_id / 50) AS INT) AS pos,
         doc_id % 100 AS src
  FROM documents WHERE doc_id < 200),
paras AS (
  SELECT d.page_id, d.pos, doc.text AS para
  FROM d JOIN documents doc ON doc.doc_id = d.src),
kept AS (
  SELECT page_id, pos, para,
    ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY page_id, pos) AS rn
  FROM paras),
rebuilt AS (
  SELECT page_id, string_agg(para, chr(10) ORDER BY pos) AS text
  FROM kept WHERE rn = 1 GROUP BY page_id),
ids AS (SELECT DISTINCT doc_id % 50 AS page_id FROM documents WHERE doc_id < 200)
SELECT ids.page_id, COALESCE(rebuilt.text, '') AS text
FROM ids LEFT JOIN rebuilt ON ids.page_id = rebuilt.page_id
"""

_ORACLE["url_host_filter"] = """
WITH p AS (
  SELECT doc_id,
    concat('https://sub', CAST(doc_id % 7 AS STRING), '.dom',
           CAST(doc_id % 13 AS STRING), '.com/p/', CAST(doc_id AS STRING)) AS url,
    concat('sub', CAST(doc_id % 7 AS STRING), '.dom',
           CAST(doc_id % 13 AS STRING), '.com') AS host
  FROM documents)
SELECT doc_id, url FROM p
WHERE NOT (host = 'dom3.com' OR host LIKE '%.dom3.com'
        OR host = 'sub2.dom5.com' OR host LIKE '%.sub2.dom5.com'
        OR host = 'dom11.com' OR host LIKE '%.dom11.com')
"""

_ORACLE["curation_v2"] = f"""
WITH toks AS (SELECT doc_id, lang, string_split({_NORM_TEXT}, ' ') AS t FROM documents),
rep AS (
  SELECT doc_id, lang, len(t) AS n_tokens,
    CASE WHEN len(t) = 0 THEN 0.0 ELSE
      ROUND(1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) END AS dw
  FROM toks),
grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
cont AS (
  SELECT grams.doc_id, COUNT(*) AS n
  FROM grams JOIN bench USING (g) WHERE grams.doc_id >= 10 GROUP BY 1),
gated AS (
  SELECT rep.doc_id, rep.lang, rep.n_tokens
  FROM rep LEFT JOIN cont ON rep.doc_id = cont.doc_id
  WHERE rep.doc_id >= 10 AND rep.dw <= 0.55 AND COALESCE(cont.n, 0) < 2)
SELECT lang, COUNT(*) AS n_kept,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM gated GROUP BY 1
"""

_ORACLE["html_to_text"] = r"""
WITH pages AS (
  SELECT doc_id,
    concat('<html><head><script>var t = "<p>trap</p>";</script>',
           '<style>p { color: red }</style></head><body><h1>Doc ',
           CAST(doc_id AS STRING), '</h1>', chr(10), '<p>', text,
           ' &amp; tail &lt;kept&gt;</p></body></html>') AS html
  FROM documents
), stripped AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<[^>]*>', ' ', 'g') AS t
  FROM pages
), decoded AS (
  SELECT doc_id,
    replace(replace(replace(replace(replace(replace(t,
      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
  FROM stripped
)
SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text FROM decoded
"""

_ORACLE["gopher_quality"] = r"""
WITH seeded AS (
  SELECT doc_id,
    text || CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN chr(10) || '- bullet one' || chr(10) || '- bullet two'
      WHEN 1 THEN chr(10) || 'trailing thought ...'
      WHEN 2 THEN ' ## ## ## ## ##'
      ELSE '' END AS text
  FROM documents
), feats AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS words,
    string_split(text, chr(10)) AS lines
  FROM seeded
), sig AS (
  SELECT doc_id,
    len(words) AS n_words,
    ROUND(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
          / GREATEST(len(words), 1), 6) AS mean_word_len,
    ROUND(CAST((len(string_split(text, '#')) - 1)
          + (length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE)
          / GREATEST(len(words), 1), 6) AS symbol_word_ratio,
    ROUND(CAST(len(list_filter(lines, ln -> regexp_matches(trim(ln), '^[-*•]'))) AS DOUBLE)
          / GREATEST(len(lines), 1), 6) AS bullet_line_frac,
    ROUND(CAST(len(list_filter(lines, ln -> regexp_matches(trim(ln), '\.\.\.$'))) AS DOUBLE)
          / GREATEST(len(lines), 1), 6) AS ellipsis_line_frac,
    ROUND(CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
          / GREATEST(len(words), 1), 6) AS alpha_word_frac,
    len(list_intersect(list_transform(words, w -> lower(w)),
        ['the','be','to','of','and','that','have','with'])) AS stopword_hits
  FROM feats
)
SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
  symbol_word_ratio, bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
  CAST(stopword_hits AS INT) AS stopword_hits,
  (n_words >= 20 AND n_words <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_word_ratio <= 0.1
   AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3
   AND alpha_word_frac >= 0.8
   AND stopword_hits >= 2) AS passes
FROM sig
"""

_ORACLE["c4_line_filter"] = """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0
    THEN concat(text, '.', chr(10), 'filler ', text, '!')
    ELSE concat(text, '.') END AS text,
  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS n_lines_kept,
  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS n_lines_dropped
FROM documents
"""

# normalize_url twin: same strip-fragment / lower-head / default-port /
# collapse-slashes / trailing-slash chain; DuckDB replacement refs are
# \\1 (not $1) and the slash-collapse needs the explicit 'g' flag
# (Spark's regexp_replace is global by default).
_ORACLE["url_dedup"] = r"""
WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id < 250 THEN
      concat('HTTPS://EX', CAST((doc_id % 250) % 7 AS STRING), '.COM:443/p//',
             CAST(doc_id % 250 AS STRING), '/')
    ELSE
      concat('https://ex', CAST((doc_id % 250) % 7 AS STRING), '.com/p/',
             CAST(doc_id % 250 AS STRING))
    END AS url
  FROM documents WHERE doc_id < 500
), s AS (
  SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM p
), h AS (
  SELECT doc_id, nofrag,
    regexp_extract(nofrag, '^([a-zA-Z]+://[^/]*)', 1) AS raw_head
  FROM s
), n AS (
  SELECT doc_id,
    concat(
      CASE WHEN lower(raw_head) LIKE 'https://%'
             THEN regexp_replace(lower(raw_head), ':443$', '')
           WHEN lower(raw_head) LIKE 'http://%'
             THEN regexp_replace(lower(raw_head), ':80$', '')
           ELSE lower(raw_head) END,
      regexp_replace(
        regexp_replace(substring(nofrag, length(raw_head) + 1), '//+', '/', 'g'),
        '(.)/$', '\1')
    ) AS norm_url
  FROM h
), ranked AS (
  SELECT doc_id, norm_url,
    ROW_NUMBER() OVER (PARTITION BY norm_url ORDER BY doc_id) AS rn
  FROM n
)
SELECT doc_id, norm_url FROM ranked WHERE rn = 1
"""

_ORACLE["contamination"] = f"""
WITH toks AS (SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= 100 AND doc_id < 300)
SELECT corpus.doc_id, COUNT(*) AS n_contaminated_grams
FROM corpus JOIN bench USING (g) GROUP BY 1
"""

# The DuckDB twin constructs byte-identical PNG/JPEG containers and
# reads the dims back arithmetically (this duckdb build lacks md5(BLOB),
# so the digest column is checked by the pytest suite instead).
_ORACLE["multimodal_decode"] = """
WITH d AS (
  SELECT doc_id, 16 + doc_id % 600 AS w, 16 + (doc_id * 7) % 600 AS h
  FROM documents
)
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 2 = 0
    THEN octet_length(unhex('89504E470D0A1A0A0000000D49484452')
         || unhex(lpad(to_hex(w), 8, '0')) || unhex(lpad(to_hex(h), 8, '0'))
         || unhex('080600000000000000'))
    ELSE octet_length(unhex('FFD8FFC0001108')
         || unhex(lpad(to_hex(h), 4, '0')) || unhex(lpad(to_hex(w), 4, '0'))
         || unhex('03000000000000000000FFD9'))
  END AS n_bytes,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
FROM d
"""


def _lsh_plane_sql(plane: int, dim: int = 64) -> str:
    """DuckDB twin of similarity._hyperplane_sign: the SAME md5-derived
    ±1 weights (computed here with the same formula, embedded as a SQL
    list literal), sign of the dot product as a '0'/'1' bucket bit."""
    import hashlib

    ws = ", ".join(
        "1.0" if int(hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else "-1.0"
        for j in range(dim)
    )
    return (
        f"CASE WHEN list_dot_product(embedding::DOUBLE[], [{ws}]::DOUBLE[]) >= 0 "
        "THEN '1' ELSE '0' END"
    )


# nprobe=2 twin: corpus side keeps the single-cell argmax (tie -> larger
# cid, matching Spark's array_max-of-struct), query side takes the top-2
# cells by dot product with tie -> SMALLER cid (matching the ascending
# (neg_score, cell) array_sort slice).
_ORACLE["ann_ivf_nprobe"] = """
WITH cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 3
), assigned AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
    (SELECT cid FROM cents
     ORDER BY list_dot_product(cv, e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell
  FROM embeddings e
), qprobe AS (
  SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qv, c.cid AS cell,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      ORDER BY list_dot_product(c.cv, e.embedding::DOUBLE[]) DESC, c.cid ASC) AS pr
  FROM embeddings e, cents c WHERE e.vec_id < 5
), q AS (
  SELECT query_id, qv, cell FROM qprobe WHERE pr <= 2
), scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.qv, a.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))), 6) AS cos
  FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

# LSH-bucketed ANN is deterministic end-to-end: bucket = 8 hyperplane sign
# bits (md5-derived weights, reproduced above), candidates share the
# query's bucket, exact cosine re-rank with the same 6-dp round +
# neighbor_id tie-break as ann_cosine_topk. Recall<1 vs brute force is
# irrelevant here — the oracle computes the SAME approximate algorithm.
_ORACLE["ann_lsh"] = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    concat({", ".join(_lsh_plane_sql(p) for p in range(8))}) AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_dot_product(q.qv, c.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

# Closed-form expectation for the streaming parse->fan-out->read-back
# pipeline over synth_pages(50, 10, 5): line i of page p is the truncated
# (unmatchable) golden S3 line iff i % 5 = p % 5 (pages.py), so each
# 10-line page contributes exactly 2 unmatched + 8 matched rows. The
# range() mirror below re-derives that formula rather than hardcoding
# 400/100 so the oracle breaks loudly if the synthesizer changes.
# closed-form expectation: synth_pages paragraphs are drawn from the 5
# golden S3 lines + 1 truncated variant, so the streamed dedup must emit
# exactly 6 rows with 6 distinct digests
_ORACLE["stream_paragraph_dedup"] = """
WITH lines AS (
  SELECT p.range AS p, i.range AS i FROM range(50) p, range(10) i
), para_key AS (
  SELECT CASE WHEN i % 5 = p % 5 THEN -1 ELSE (p + i) % 5 END AS k FROM lines
)
SELECT COUNT(DISTINCT k) AS n_paras, COUNT(DISTINCT k) AS n_digests FROM para_key
"""

_ORACLE["stream_windowed_counts"] = """
WITH lines AS (
  SELECT p.range AS p, i.range AS i FROM range(50) p, range(10) i
)
SELECT CASE WHEN i % 5 = p % 5 THEN 'unmatched' ELSE 'matched' END AS status,
  COUNT(*) AS n_rows
FROM lines GROUP BY 1
"""


_ORACLE["asof_enrich_version"] = """
WITH deploys AS (
  SELECT t.event_type, v.version,
         TIMESTAMP '2024-01-01 00:00:00'
           + (17*v.version*v.version + 5*t.ti) * INTERVAL 1 HOUR AS deploy_ts
  FROM (VALUES ('click',0),('error',1),('purchase',2),('signup',3),('view',4))
       t(event_type, ti),
       (SELECT CAST(g AS INT) AS version FROM generate_series(0, 9) s(g)) v
)
SELECT e.event_type, d.version,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events e ASOF LEFT JOIN deploys d
  ON e.event_type = d.event_type AND e.ts >= d.deploy_ts
GROUP BY 1, 2
"""

_ORACLE["range_join_ip_blocks"] = """
WITH facts AS (
  SELECT event_id, user_id,
         (user_id * 2654435761) % 4294967296 AS ip
  FROM events
), ranges AS (
  SELECT CAST(g AS INT) AS range_id,
         g*g*1048576 AS lo, (g+1)*(g+1)*1048576 AS hi
  FROM generate_series(0, 63) s(g)
)
SELECT r.range_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users
FROM facts f JOIN ranges r ON f.ip >= r.lo AND f.ip < r.hi
GROUP BY 1
"""

_ORACLE["boilerplate_removal"] = r"""
WITH lines AS (
  SELECT doc_id % 60 AS page_id,
         CAST(FLOOR(doc_id / 60) AS INT) AS pos,
         'g' || CAST((doc_id % 60) % 7 AS VARCHAR) AS grp,
         CASE WHEN CAST(FLOOR(doc_id / 60) AS INT) = 4
                THEN 'FOOTER-g' || CAST((doc_id % 60) % 7 AS VARCHAR)
              WHEN CAST(FLOOR(doc_id / 60) AS INT) = 0 AND (doc_id % 60) % 2 = 0
                THEN 'HEADER-g' || CAST((doc_id % 60) % 7 AS VARCHAR)
              ELSE COALESCE(text, '') END AS line
  FROM documents WHERE doc_id < 300
), counts AS (
  SELECT grp, line, COUNT(DISTINCT page_id) AS n_pages
  FROM lines GROUP BY 1, 2
), kept AS (
  SELECT l.page_id, l.pos, l.grp, l.line
  FROM lines l JOIN counts c USING (grp, line) WHERE c.n_pages < 3
), rebuilt AS (
  SELECT page_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY 1
), ids AS (
  SELECT DISTINCT doc_id % 60 AS page_id,
         'g' || CAST((doc_id % 60) % 7 AS VARCHAR) AS grp
  FROM documents WHERE doc_id < 300
)
SELECT ids.page_id, ids.grp, COALESCE(rebuilt.text, '') AS text
FROM ids LEFT JOIN rebuilt USING (page_id)
"""

_ORACLE["unigram_logprob"] = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, COUNT(*) AS c FROM toks GROUP BY 1
), tot AS (SELECT SUM(c) AS t FROM counts)
SELECT toks.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(ln(CAST(counts.c AS DOUBLE) / CAST(tot.t AS DOUBLE))), 4)
         AS mean_logprob
FROM toks JOIN counts USING (token), tot
GROUP BY 1
"""


_ORACLE["repeated_ngram_removal"] = r"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks
  FROM documents
), toks AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS tok
  FROM docs, UNNEST(generate_series(1, len(toks))) t(i)
), grams AS (
  SELECT doc_id, i - 1 AS gpos, array_to_string(toks[i:i+7], chr(31)) AS gram
  FROM docs, UNNEST(generate_series(1, len(toks) - 7)) g(i)
  WHERE len(toks) >= 8
), dup AS (
  SELECT gram FROM grams GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT g.doc_id, g.gpos + o.k AS pos
  FROM grams g JOIN dup USING (gram), UNNEST(generate_series(0, 7)) o(k)
), agg AS (
  SELECT t.doc_id,
         COUNT(*) FILTER (WHERE c.pos IS NOT NULL) AS n_removed,
         COALESCE(string_agg(t.tok, ' ' ORDER BY t.pos)
                  FILTER (WHERE c.pos IS NULL), '') AS text
  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
  GROUP BY 1
)
SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
       CAST(a.n_removed AS BIGINT) AS n_removed, a.text
FROM docs d JOIN agg a USING (doc_id)
"""

_ORACLE["card_signals"] = r"""
WITH planted AS (
  SELECT doc_id,
         COALESCE(text, '') ||
         CASE WHEN doc_id % 7 = 0 THEN ' pay 4111 1111 1111 1111 now'
              WHEN doc_id % 7 = 1 THEN ' ref 4111-1111-1111-1112 end'
              ELSE '' END AS text
  FROM documents
), cands AS (
  SELECT doc_id,
         regexp_extract_all(text, '\b(?:[0-9][ -]?){12,18}[0-9]\b') AS cs
  FROM planted
), flat AS (
  SELECT doc_id, regexp_replace(c, '[^0-9]', '', 'g') AS d
  FROM cands, UNNEST(cs) u(c)
), judged AS (
  SELECT doc_id,
         CASE WHEN length(d) >= 13 AND list_sum(list_transform(
                generate_series(1, length(d)),
                i -> CASE WHEN i % 2 = 0 THEN
                       CASE WHEN (ascii(substr(d, length(d) - i + 1, 1)) - 48) * 2 > 9
                            THEN (ascii(substr(d, length(d) - i + 1, 1)) - 48) * 2 - 9
                            ELSE (ascii(substr(d, length(d) - i + 1, 1)) - 48) * 2 END
                     ELSE ascii(substr(d, length(d) - i + 1, 1)) - 48 END
              )) % 10 = 0 THEN 1 ELSE 0 END AS ok
  FROM flat
)
SELECT c.doc_id,
       CAST(len(c.cs) AS BIGINT) AS n_candidates,
       CAST(COALESCE(SUM(j.ok), 0) AS BIGINT) AS n_luhn_valid
FROM cands c LEFT JOIN judged j USING (doc_id)
GROUP BY c.doc_id, len(c.cs)
"""

_ORACLE["temperature_mixture"] = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_in FROM documents GROUP BY 1
), tot AS (
  SELECT SUM(n_in) AS n_total, SUM(POW(n_in, 0.5)) AS z FROM counts
), rates AS (
  SELECT source, n_in,
         CAST(FLOOR(LEAST(1.0,
              0.5 * tot.n_total * (POW(n_in, 0.5) / tot.z) / n_in
            ) * 1000000 + 0.5) AS BIGINT) AS rate_ppm
  FROM counts, tot
), kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN rates r USING (source)
  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS STRING)), 1, 8) AS BIGINT)
        % 1000000 < r.rate_ppm
  GROUP BY 1
)
SELECT r.source, CAST(r.n_in AS BIGINT) AS n_in, r.rate_ppm,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k USING (source)
"""

_ORACLE["linear_quality"] = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS token
  FROM documents
), w AS (
  SELECT doc_id,
         ((CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 1024)
           * 2654435761) % 997 / 997.0 - 0.5 AS wt
  FROM toks
), s AS (
  SELECT doc_id, COUNT(*) AS n, SUM(wt) AS z FROM w GROUP BY 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       ROUND(1.0 / (1.0 + exp(-(z / n))), 4) AS score
FROM s
"""

_ORACLE["script_signals"] = r"""
WITH planted AS (
  SELECT doc_id,
         COALESCE(text, '') ||
         CASE WHEN doc_id % 5 = 1 THEN ' привет мир как дела сегодня'
              WHEN doc_id % 5 = 2 THEN ' 你好世界今天天气很好谢谢再见'
              WHEN doc_id % 5 = 3 THEN ' مرحبا بالعالم كيف حالك اليوم'
              ELSE '' END AS text
  FROM documents
), counts AS (
  SELECT doc_id,
    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
    length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
    length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS n_cjk,
    length(text) - length(regexp_replace(text, '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic
  FROM planted
)
SELECT doc_id,
       CAST(n_latin AS BIGINT) AS n_latin,
       CAST(n_digit AS BIGINT) AS n_digit,
       CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
       CAST(n_cjk AS BIGINT) AS n_cjk,
       CAST(n_arabic AS BIGINT) AS n_arabic,
       CASE GREATEST(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic)
         WHEN 0 THEN 'none'
         WHEN n_latin THEN 'latin'
         WHEN n_digit THEN 'digit'
         WHEN n_cyrillic THEN 'cyrillic'
         WHEN n_cjk THEN 'cjk'
         ELSE 'arabic' END AS main_script
FROM counts
"""

_ORACLE["domain_quality"] = r"""
WITH planted AS (
  SELECT doc_id, source,
         CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0
              THEN COALESCE(text, '') || repeat(' tok95', 200)
              ELSE COALESCE(text, '') END AS text
  FROM documents
), toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM planted
), w AS (
  SELECT doc_id,
         ((CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 1024)
           * 2654435761) % 997 / 997.0 - 0.5 AS wt
  FROM toks
), score AS (
  SELECT doc_id,
         ROUND(1.0 / (1.0 + exp(-(SUM(wt) / COUNT(*)))), 4) AS score
  FROM w GROUP BY 1
), sx AS (
  SELECT p.doc_id, p.source,
         CAST(ROUND(s.score * 10000) AS BIGINT) AS sx
  FROM planted p JOIN score s USING (doc_id)
), stats AS (
  SELECT source, COUNT(*) AS n, SUM(sx) AS s FROM sx GROUP BY 1
), good AS (
  SELECT source FROM stats WHERE n >= 20 AND s >= 4500 * n
)
SELECT sx.source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(sx.sx) AS BIGINT) AS sum_score_x1e4
FROM sx JOIN good USING (source)
GROUP BY 1
"""

_ORACLE["curation_v3"] = r"""
WITH planted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 11 = 1 THEN 'привет мир как дела сегодня друзья'
              WHEN doc_id % 13 = 0
                THEN COALESCE(text, '') || ' pay 4111 1111 1111 1111 now'
              ELSE COALESCE(text, '') END AS text
  FROM documents
), toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM planted
), w AS (
  SELECT doc_id,
         ((CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 1024)
           * 2654435761) % 997 / 997.0 - 0.5 AS wt
  FROM toks
), score AS (
  SELECT doc_id,
         ROUND(1.0 / (1.0 + exp(-(SUM(wt) / COUNT(*)))), 4) AS score
  FROM w GROUP BY 1
), counts AS (
  SELECT doc_id,
    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
    length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
    length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS n_cjk,
    length(text) - length(regexp_replace(text, '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic
  FROM planted
), script AS (
  SELECT doc_id,
       CASE GREATEST(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic)
         WHEN 0 THEN 'none'
         WHEN n_latin THEN 'latin'
         WHEN n_digit THEN 'digit'
         WHEN n_cyrillic THEN 'cyrillic'
         WHEN n_cjk THEN 'cjk'
         ELSE 'arabic' END AS main_script
  FROM counts
), cands AS (
  SELECT doc_id,
         regexp_extract_all(text, '\b(?:[0-9][ -]?){12,18}[0-9]\b') AS cs
  FROM planted
), flat AS (
  SELECT doc_id, regexp_replace(c, '[^0-9]', '', 'g') AS d
  FROM cands, UNNEST(cs) u(c)
), judged AS (
  SELECT doc_id,
         CASE WHEN length(d) >= 13 AND list_sum(list_transform(
                generate_series(1, length(d)),
                i -> CASE WHEN i % 2 = 0 THEN
                       CASE WHEN (ascii(substr(d, length(d) - i + 1, 1)) - 48) * 2 > 9
                            THEN (ascii(substr(d, length(d) - i + 1, 1)) - 48) * 2 - 9
                            ELSE (ascii(substr(d, length(d) - i + 1, 1)) - 48) * 2 END
                     ELSE ascii(substr(d, length(d) - i + 1, 1)) - 48 END
              )) % 10 = 0 THEN 1 ELSE 0 END AS ok
  FROM flat
), pan AS (
  SELECT p.doc_id, COALESCE(SUM(j.ok), 0) AS n_pan
  FROM planted p LEFT JOIN judged j USING (doc_id)
  GROUP BY 1
)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(CAST(ROUND(s.score * 10000) AS BIGINT)) AS BIGINT) AS sum_score_x1e4
FROM planted p
JOIN score s USING (doc_id)
JOIN script sc USING (doc_id)
JOIN pan USING (doc_id)
WHERE sc.main_script = 'latin' AND pan.n_pan = 0 AND s.score >= 0.45
GROUP BY 1
"""

_ORACLE["stream_minhash_dedup"] = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300 AND text IS NOT NULL
), toks AS (
  SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t FROM base
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig AS (
  SELECT doc_id, {_MH_ALL} FROM grams GROUP BY doc_id
), bands AS (
  {_BAND_SELECTS}
), owner AS (
  SELECT band_idx, band_key, MIN(doc_id) AS fo FROM bands GROUP BY 1, 2
), verdict AS (
  SELECT b.doc_id, MIN(o.fo) AS fo
  FROM bands b JOIN owner o USING (band_idx, band_key) GROUP BY 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM verdict WHERE fo = doc_id
"""


def _zorder_oracle() -> str:
    from access_log_parser_spark.functions.zorder import zorder_sql_term

    term = zorder_sql_term(["bx", "by"], bits=6)
    return f"""
WITH b AS (
  SELECT hour(ts) AS bx, user_id % 64 AS by FROM events
), z AS (
  SELECT {term} AS zkey FROM b
)
SELECT CAST(zkey >> 6 AS BIGINT) AS z_prefix,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(zkey) AS BIGINT) AS zmin,
       CAST(MAX(zkey) AS BIGINT) AS zmax
FROM z GROUP BY 1
"""


_ORACLE["zorder_key"] = _zorder_oracle()

_ORACLE["chunk_documents"] = r"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= 64 THEN 1
              ELSE CAST(FLOOR((len(toks) - 64 + 47) / 48.0) AS INT) + 1 END AS k
  FROM docs
), chunks AS (
  SELECT doc_id, i AS chunk_id,
         LEAST(i * 48, GREATEST(n - 64, 0)) AS start_pos, toks, n
  FROM sized, UNNEST(generate_series(0, k - 1)) c(i)
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(start_pos AS BIGINT) AS start_pos,
       CAST(LEAST(64, n - start_pos) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[start_pos + 1:start_pos + 64], ' ') AS chunk_text
FROM chunks
"""


from access_log_parser_spark.operators.webtext import (
    CONTROL_RE as _CONTROL_RE,
    MOJIBAKE_RE as _MOJIBAKE_RE,
)

_ORACLE["host_frequency_cap"] = """
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM ranked WHERE rk <= 20 GROUP BY 1
"""

# the same regexes the operator uses (webtext.MOJIBAKE_RE / CONTROL_RE):
# literal alternations and a \\x-escaped C0 class parse identically under
# Java regex (Spark) and RE2 (DuckDB)
_ORACLE["encoding_signals"] = f"""
WITH planted AS (
  SELECT doc_id,
    COALESCE(text, '') ||
    CASE WHEN doc_id % 5 = 0 THEN chr(65533) || ' x ' || chr(1) || chr(2)
         WHEN doc_id % 7 = 0 THEN chr(195) || chr(169) || ' q ' ||
                                  chr(226) || chr(8364) || chr(8482)
         ELSE '' END AS text
  FROM documents
), sig AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT) AS n_replacement,
    CAST(len(regexp_extract_all(text, '{_CONTROL_RE}')) AS BIGINT) AS n_control,
    CAST(len(regexp_extract_all(text, '{_MOJIBAKE_RE}')) AS BIGINT) AS n_mojibake
  FROM planted
)
SELECT doc_id, n_replacement, n_control, n_mojibake,
       CAST(n_replacement + n_control + n_mojibake <= 0 AS BIGINT) AS enc_clean
FROM sig
"""

_ORACLE["quantize_embeddings"] = """
WITH a AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
  FROM embeddings
), c AS (
  SELECT vec_id, amax,
         CASE WHEN amax = 0
              THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(
                     v, x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
         END AS codes
  FROM a
)
SELECT vec_id,
       CAST(len(codes) AS BIGINT) AS dim,
       CAST(list_sum(codes) AS BIGINT) AS sum_codes,
       CAST(list_min(codes) AS BIGINT) AS min_code,
       CAST(list_max(codes) AS BIGINT) AS max_code,
       ROUND(amax / 127.0, 9) AS scale_r9
FROM c
"""

# SemDedup: centroid pick, dot-product argmax (ties to the HIGHER centroid
# id — Spark's array_max over (score, cell) structs), min-id-owner prune.
_ORACLE["semdedup"] = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), planted AS (
  SELECT vec_id AS id, v FROM base
  UNION ALL
  SELECT vec_id + 100000 AS id, v FROM base WHERE vec_id % 10 = 0
), cent AS (
  SELECT vec_id AS cid, v AS cv FROM base
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 6
), scored AS (
  SELECT p.id, p.v, c.cid, list_dot_product(p.v, c.cv) AS s
  FROM planted p CROSS JOIN cent c
), asg AS (
  SELECT id, v, cid AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY id ORDER BY s DESC, cid DESC) AS rk
    FROM scored) WHERE rk = 1
), dropped AS (
  SELECT DISTINCT b.id
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
  WHERE ROUND(list_dot_product(a.v, b.v)
    / (sqrt(list_dot_product(a.v, a.v))
       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.95
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(id) AS BIGINT) AS sum_id
FROM asg WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id = asg.id)
GROUP BY 1
"""

# the join-assignment path must produce byte-identical results to the
# literal path — same replay
_ORACLE["semdedup_join"] = _ORACLE["semdedup"]

_ORACLE["block_dedup"] = """
WITH d AS (
  SELECT doc_id,
         'shared license block variant v' || CAST(doc_id % 5 AS VARCHAR)
           || ' applies here now ' || COALESCE(text, '') AS t
  FROM documents WHERE doc_id < 300
), tok AS (
  SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ts FROM d
), blocks AS (
  SELECT doc_id, g.i - 1 AS pos,
         array_to_string(list_slice(ts, (g.i - 1) * 8 + 1, g.i * 8), ' ')
           AS blk
  FROM tok, UNNEST(generate_series(1, CAST(ceil(len(ts) / 8.0) AS INT)))
       AS g(i)
), marked AS (
  SELECT doc_id, pos, blk,
         ROW_NUMBER() OVER (PARTITION BY md5(blk) ORDER BY doc_id, pos) AS rn
  FROM blocks
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY pos),
                '') AS text,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM marked GROUP BY doc_id
"""


def _band_sql(src: str) -> str:
    """The 4-band LSH key projection over a 16-column signature CTE —
    same formula as _BAND_SELECTS, parameterized on the source CTE."""
    return "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5(concat_ws(',', {cols}))"
        " AS band_key FROM {src}".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{i} AS STRING)" for i in range(4 * b, 4 * b + 4)
            ),
            src=src,
        )
        for b in range(4)
    )


_ORACLE["cross_snapshot_dedup"] = f"""
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
), new0 AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0
), newp AS (
  SELECT n.doc_id, n.source,
    CASE WHEN n.doc_id % 11 = 3 AND o.text IS NOT NULL THEN o.text
         WHEN n.doc_id % 11 = 5 AND o.text IS NOT NULL THEN o.text || ' zz tail'
         ELSE n.text END AS text
  FROM new0 n LEFT JOIN old o ON n.doc_id - n.doc_id % 7 = o.doc_id
), oldfp AS (
  SELECT DISTINCT md5({_NORM_TEXT}) AS fp FROM old WHERE text IS NOT NULL
), kept1 AS (
  SELECT * FROM newp
  WHERE NOT EXISTS (
    SELECT 1 FROM oldfp WHERE oldfp.fp = md5({_NORM_TEXT}))
), toks_old AS (
  SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t
  FROM old WHERE text IS NOT NULL
), grams_old AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks_old, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig_old AS (
  SELECT doc_id, {_MH_ALL} FROM grams_old GROUP BY doc_id
), bands_old AS (
  {_band_sql('sig_old')}
), toks_new AS (
  SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t
  FROM kept1 WHERE text IS NOT NULL
), grams_new AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks_new, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig_new AS (
  SELECT doc_id, {_MH_ALL} FROM grams_new GROUP BY doc_id
), bands_new AS (
  {_band_sql('sig_new')}
), near_hit AS (
  SELECT DISTINCT n.doc_id
  FROM bands_new n JOIN bands_old o
    ON n.band_idx = o.band_idx AND n.band_key = o.band_key
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM kept1
WHERE NOT EXISTS (SELECT 1 FROM near_hit h WHERE h.doc_id = kept1.doc_id)
GROUP BY 1
"""

_ORACLE["perplexity_buckets"] = r"""
WITH toks AS (
  SELECT doc_id, source,
         UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, COUNT(*) AS c FROM toks GROUP BY 1
), tot AS (SELECT SUM(c) AS t FROM counts),
scored AS (
  SELECT toks.doc_id, toks.source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(AVG(ln(CAST(counts.c AS DOUBLE) / CAST(tot.t AS DOUBLE))), 4)
           AS mean_logprob
  FROM toks JOIN counts USING (token), tot
  GROUP BY 1, 2
)
SELECT doc_id, source, n_tokens, mean_logprob,
       CAST(NTILE(3) OVER (
         PARTITION BY source ORDER BY mean_logprob DESC, doc_id) AS BIGINT)
         AS bucket
FROM scored
"""


_ORACLE["dsir_select"] = r"""
WITH raw_toks AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 256 AS bucket
  FROM documents,
       UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) u(tok)
  WHERE doc_id < 400
), tgt_toks AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 256 AS bucket
  FROM documents,
       UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) u(tok)
  WHERE doc_id >= 400 AND doc_id < 450
), rc AS (SELECT bucket, COUNT(*) AS c FROM raw_toks GROUP BY 1),
   tc AS (SELECT bucket, COUNT(*) AS c FROM tgt_toks GROUP BY 1),
   rt AS (SELECT SUM(c) AS t FROM rc),
   tt AS (SELECT SUM(c) AS t FROM tc),
   lam AS (
     SELECT COALESCE(rc.bucket, tc.bucket) AS bucket,
            ln((COALESCE(tc.c, 0) + 1.0) / (tt.t + 256.0))
          - ln((COALESCE(rc.c, 0) + 1.0) / (rt.t + 256.0)) AS lam
     FROM rc FULL OUTER JOIN tc ON rc.bucket = tc.bucket, rt, tt
   ), w AS (
     SELECT r.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
            ROUND(SUM(l.lam), 4) AS logweight
     FROM raw_toks r JOIN lam l USING (bucket)
     GROUP BY 1
   )
SELECT doc_id, n_tokens, logweight FROM w
ORDER BY logweight DESC, doc_id
LIMIT 50
"""

_ORACLE["epoch_shuffle"] = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY md5('3:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS position
FROM documents WHERE doc_id < 500
"""

_ORACLE["keep_best_duplicate"] = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
), corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL SELECT doc_id + 100000, text FROM base
  UNION ALL SELECT doc_id + 200000, text FROM base
), scored AS (
  SELECT doc_id, md5({_NORM_TEXT}) AS fp,
         CAST(doc_id % 7 AS DOUBLE) AS score
  FROM corpus WHERE text IS NOT NULL
), r AS (
  SELECT doc_id, fp, score,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY score DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY fp) AS n
  FROM scored
)
SELECT doc_id, fp, score, CAST(n AS BIGINT) AS n_dups FROM r WHERE rk = 1
"""

from access_log_parser_spark.operators.webtext import (  # noqa: E402
    URL_SPAM_TERMS as _URL_SPAM_TERMS,
)

_URL_TERM_SCORE_SQL = " + ".join(
    f"{w} * len(regexp_extract_all(u, '{t}'))" for t, w in _URL_SPAM_TERMS
)
_ORACLE["url_spam_score"] = f"""
WITH pages AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 10 = 0 THEN
        'http://free-porn-casino-7.' || CAST(doc_id AS VARCHAR)
          || '.example/xxx?ad=viagra'
      WHEN doc_id % 7 = 0 THEN
        'http://12345' || CAST(doc_id AS VARCHAR) || '.example/page/'
          || CAST(doc_id AS VARCHAR)
      ELSE
        'https://news.example' || CAST(doc_id % 5 AS VARCHAR)
          || '.org/article/' || CAST(doc_id AS VARCHAR)
    END AS url
  FROM documents WHERE doc_id < 500
), lowered AS (
  SELECT doc_id, url, lower(url) AS u,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1)
           AS host
  FROM pages
), scored AS (
  SELECT doc_id, url,
    ({_URL_TERM_SCORE_SQL})
    + CASE WHEN CAST(len(regexp_extract_all(host, '[0-9]')) AS DOUBLE)
                / GREATEST(length(host), 1) > 0.3 THEN 2 ELSE 0 END
    + CASE WHEN len(regexp_extract_all(host, '-')) >= 3 THEN 2 ELSE 0 END
      AS s
  FROM lowered
)
SELECT doc_id, url, CAST(s AS BIGINT) AS spam_score, s >= 5 AS is_spam
FROM scored
"""

from access_log_parser_spark.operators.webtext import (  # noqa: E402
    CANONICAL_RE as _CANONICAL_RE,
    ROBOTS_CONTENT_FIRST_RE as _ROBOTS_CONTENT_FIRST_RE,
    ROBOTS_CONTENT_RE as _ROBOTS_CONTENT_RE,
)


def _sqlq(s: str) -> str:
    """Escape a string for embedding in a single-quoted SQL literal."""
    return s.replace("'", "''")


from access_log_parser_spark.operators.webtext import (  # noqa: E402
    ANCHOR_TEXT_RE as _ANCHOR_TEXT_RE,
    BLOCK_SPLIT_RE as _BLOCK_SPLIT_RE,
)

from access_log_parser_spark.operators.webtext import (  # noqa: E402
    ANCHOR_TAG_RE as _ANCHOR_TAG_RE,
    HREF_RE as _HREF_RE,
)

_ORACLE["sitemap_locs"] = """
SELECT 's' || CAST(doc_id AS VARCHAR) || '.example' AS host,
       CAST(1 AS BIGINT) AS position,
       'https://s' || CAST(doc_id AS VARCHAR) || '.example/a/'
         || CAST(doc_id AS VARCHAR) AS loc
FROM documents WHERE doc_id < 500
UNION ALL
SELECT 's' || CAST(doc_id AS VARCHAR) || '.example',
       CAST(2 AS BIGINT),
       'https://s' || CAST(doc_id AS VARCHAR) || '.example/b/'
         || CAST(doc_id AS VARCHAR)
FROM documents WHERE doc_id < 500
"""

_ORACLE["sitemap_entries"] = """
-- CLOSED-FORM expected values per synthesized url block; the loc-less
-- third block is dropped (position 3 never appears)
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS k,
         lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
         lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
  FROM documents WHERE doc_id < 400
)
SELECT 's' || k || '.example' AS host,
       CAST(1 AS BIGINT) AS position,
       'https://s' || k || '.example/a/' || k AS loc,
       '2024-' || mm || '-' || dd ||
         CASE WHEN doc_id % 2 = 0 THEN 'T10:30:00Z' ELSE '' END AS lastmod,
       '2024-' || mm || '-' || dd AS lastmod_date,
       CASE WHEN doc_id % 3 = 0 THEN 'daily' END AS changefreq,
       CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE) AS priority
FROM d
UNION ALL
SELECT 's' || k || '.example',
       CAST(2 AS BIGINT),
       'https://s' || k || '.example/b/' || k,
       NULL, NULL, NULL, NULL
FROM d
"""

_ORACLE["stratified_topk"] = """
WITH d AS (
  SELECT doc_id, source,
         CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id < 500
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
  FROM d
)
SELECT doc_id, source, n_chars FROM r WHERE rk <= 5
"""

_ORACLE["robots_gate"] = """
SELECT
  CASE
    WHEN doc_id % 3 = 0 THEN
      'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/blocked/p'
        || CAST(doc_id AS VARCHAR)
    WHEN doc_id % 3 = 1 THEN
      'https://h' || CAST(doc_id % 7 AS VARCHAR)
        || '.example/blocked/open/p' || CAST(doc_id AS VARCHAR)
    ELSE
      'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/fine/p'
        || CAST(doc_id AS VARCHAR)
  END AS url,
  'h' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
  CASE
    WHEN doc_id % 3 = 0 THEN '/blocked/p' || CAST(doc_id AS VARCHAR)
    WHEN doc_id % 3 = 1 THEN '/blocked/open/p' || CAST(doc_id AS VARCHAR)
    ELSE '/fine/p' || CAST(doc_id AS VARCHAR)
  END AS path,
  (doc_id % 3) <> 0 AS fetch_allowed
FROM documents WHERE doc_id < 500
"""

_ORACLE["robots_gate_wildcards"] = """
SELECT
  CASE
    WHEN doc_id % 4 = 0 THEN
      'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/files/r'
        || CAST(doc_id AS VARCHAR) || '.pdf'
    WHEN doc_id % 4 = 1 THEN
      'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/tmp/x'
        || CAST(doc_id AS VARCHAR)
    WHEN doc_id % 4 = 2 THEN
      'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/tmp/public/x'
        || CAST(doc_id AS VARCHAR)
    ELSE
      'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/ok/p'
        || CAST(doc_id AS VARCHAR) || '.pdfx'
  END AS url,
  'w' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
  CASE
    WHEN doc_id % 4 = 0 THEN '/files/r' || CAST(doc_id AS VARCHAR) || '.pdf'
    WHEN doc_id % 4 = 1 THEN '/tmp/x' || CAST(doc_id AS VARCHAR)
    WHEN doc_id % 4 = 2 THEN '/tmp/public/x' || CAST(doc_id AS VARCHAR)
    ELSE '/ok/p' || CAST(doc_id AS VARCHAR) || '.pdfx'
  END AS path,
  -- closed form: %4=0 dies to '/*.pdf$', %4=1 to '/tmp*'; %4=2 is
  -- rescued by the LONGER 'Allow: /tmp/public*'; %4=3 misses the $
  -- anchor ('.pdfx' does not end in '.pdf') and no other rule applies
  (doc_id % 4) IN (2, 3) AS fetch_allowed
FROM documents WHERE doc_id < 500
"""

_ORACLE["robots_sitemap_urls"] = """
SELECT 's' || CAST(doc_id AS VARCHAR) || '.example' AS host,
       CAST(1 AS BIGINT) AS position,
       'https://s' || CAST(doc_id AS VARCHAR) || '.example/sm1.xml'
         AS sitemap_url
FROM documents WHERE doc_id < 500
UNION ALL
SELECT 's' || CAST(doc_id AS VARCHAR) || '.example',
       CAST(2 AS BIGINT),
       'https://s' || CAST(doc_id AS VARCHAR) || '.example/sm2.xml'
FROM documents WHERE doc_id < 500
"""

_ORACLE["robots_crawl_delay"] = """
-- closed form: googlebot group never applies to '*'; the two '*'
-- groups set (doc_id%7)+0.5 and (doc_id%7)+2 -> min; 'oops' ignored
SELECT 'd' || CAST(doc_id AS VARCHAR) || '.example' AS host,
       CAST(doc_id % 7 AS DOUBLE) + 0.5 AS crawl_delay
FROM documents WHERE doc_id < 500
"""

_ORACLE["warc_scan"] = """
WITH d AS (
  SELECT doc_id,
         '<html><body>' || COALESCE(text, '') || '</body></html>' AS html
  FROM documents WHERE doc_id < 500
)
SELECT 'mem://' || CAST(doc_id AS VARCHAR) AS source,
       CAST(0 AS BIGINT) AS record_idx,
       'response' AS warc_type,
       'https://warc.example/' || CAST(doc_id AS VARCHAR) AS target_uri,
       CAST(200 AS BIGINT) AS http_status,
       html AS body,
       FALSE AS truncated
FROM d
UNION ALL
SELECT 'mem://' || CAST(doc_id AS VARCHAR),
       CAST(1 AS BIGINT),
       'metadata',
       'https://warc.example/' || CAST(doc_id AS VARCHAR),
       CAST(-1 AS BIGINT),
       'len=' || CAST(octet_length(encode(html)) AS VARCHAR),
       FALSE
FROM d
"""

_ORACLE["warc_to_wet"] = r"""
WITH d AS (
  SELECT doc_id,
         '<html><body>' || COALESCE(text, '') || '</body></html>' AS html
  FROM documents WHERE doc_id < 500
), stripped AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<[^>]*>', ' ', 'g') AS t
  FROM d
), decoded AS (
  SELECT doc_id,
    replace(replace(replace(replace(replace(replace(t,
      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
  FROM stripped
)
SELECT 'mem://' || CAST(doc_id AS VARCHAR) AS source,
       CAST(0 AS BIGINT) AS record_idx,
       'https://warc.example/' || CAST(doc_id AS VARCHAR) AS target_uri,
       '2024-01-01T00:00:00Z' AS warc_date,
       trim(regexp_replace(t, '\s+', ' ', 'g')) AS text,
       FALSE AS truncated
FROM decoded
"""

_ORACLE["wet_scan"] = """
-- the request record (idx 0) is filtered by the conversion-type gate;
-- the conversion record lands at idx 1 with the raw text as its block
SELECT 'wet://' || CAST(doc_id AS VARCHAR) AS source,
       CAST(1 AS BIGINT) AS record_idx,
       'https://wet.example/' || CAST(doc_id AS VARCHAR) AS target_uri,
       '2024-02-02T00:00:00Z' AS warc_date,
       COALESCE(text, '') AS text,
       FALSE AS truncated
FROM documents WHERE doc_id < 500
"""

_ORACLE["wat_scan"] = """
SELECT 'wat://' || CAST(doc_id AS VARCHAR) AS source,
       'https://wat.example/' || CAST(doc_id AS VARCHAR) AS target_uri,
       CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
         AS content_length,
       FALSE AS truncated
FROM documents WHERE doc_id < 500
"""

_ORACLE["extract_links"] = f"""
WITH pages AS (
  SELECT doc_id,
    '<p>see <a href="https://ex' || CAST(doc_id % 5 AS VARCHAR)
    || '.org/a/' || CAST(doc_id AS VARCHAR) || '">article <b>'
    || CAST(doc_id AS VARCHAR) || '</b></a> and <a href="/rel/'
    || CAST(doc_id AS VARCHAR) || '">related reading</a></p>' AS html
  FROM documents WHERE doc_id < 500
), tags AS (
  SELECT doc_id,
         UNNEST(regexp_extract_all(html, '{_sqlq(_ANCHOR_TAG_RE)}', 0)) AS m
  FROM pages
)
SELECT doc_id,
  regexp_extract(m, '{_sqlq(_HREF_RE)}', 1) AS href,
  trim(regexp_replace(regexp_replace(m, '(?s)<[^>]*>', ' ', 'g'),
                      '\\s+', ' ', 'g')) AS anchor
FROM tags
"""


def _pagerank_oracle(
    iters: int = 3, d: float = 0.85, n: int = 20, as_cte: bool = False
):
    """Unrolled power-iteration CTE chain with the EXACT float constants
    the operator computes in Python (repr round-trips the doubles).
    ``as_cte=True`` returns (cte_sql, final_table_name) so composite
    oracles (frontier_build) can extend the chain instead of
    re-deriving it."""
    base, dd, init = repr((1.0 - d) / n), repr(d), repr(1.0 / n)
    sql = f"""WITH e AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
         'h' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
  FROM documents WHERE doc_id < 500
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT node, {init} AS rank FROM nodes)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
m{i} AS (
  SELECT e.dst AS node, SUM({prev}.rank / deg.deg) AS mass
  FROM e JOIN {prev} ON e.src = {prev}.node JOIN deg ON e.src = deg.src
  GROUP BY 1
), r{i} AS (
  SELECT nodes.node, {base} + {dd} * COALESCE(m{i}.mass, 0.0) AS rank
  FROM nodes LEFT JOIN m{i} USING (node)
)"""
        prev = f"r{i}"
    if as_cte:
        return sql, prev
    return sql + f"\nSELECT node, ROUND(rank, 6) AS rank FROM {prev}"


_ORACLE["pagerank_hosts"] = _pagerank_oracle()


def _trustrank_spam_oracle(
    iters: int = 3, d: float = 0.85, n: int = 20, n_seeds: int = 5
) -> str:
    """Pagerank CTE chain + an unrolled biased-teleport TrustRank chain
    over the same e/nodes/deg tables; spam mass is computed from the
    two ROUNDED rank columns exactly as graph.spam_mass does."""
    cte, final = _pagerank_oracle(iters, d, n, as_cte=True)
    dd, omd, tinit = repr(d), repr(1.0 - d), repr(1.0 / n_seeds)
    sql = cte + f""",
tele AS (
  SELECT node, CASE WHEN CAST(substr(node, 2) AS INTEGER) < {n_seeds}
               THEN {tinit} ELSE 0.0 END AS t
  FROM nodes
), t0 AS (SELECT node, t AS trust FROM tele)"""
    prev = "t0"
    for i in range(1, iters + 1):
        sql += f""",
tm{i} AS (
  SELECT e.dst AS node, SUM({prev}.trust / deg.deg) AS mass
  FROM e JOIN {prev} ON e.src = {prev}.node JOIN deg ON e.src = deg.src
  GROUP BY 1
), t{i} AS (
  SELECT tele.node,
         {omd} * tele.t + {dd} * COALESCE(tm{i}.mass, 0.0) AS trust
  FROM tele LEFT JOIN tm{i} USING (node)
)"""
        prev = f"t{i}"
    return sql + f""",
pr AS (SELECT node, ROUND(rank, 6) AS rank FROM {final}),
tr AS (SELECT node, ROUND(trust, 6) AS trust FROM {prev})
SELECT pr.node, pr.rank, tr.trust,
       ROUND((pr.rank - tr.trust) / pr.rank, 6) AS spam_mass
FROM pr JOIN tr USING (node)"""


_ORACLE["trustrank_spam"] = _trustrank_spam_oracle()

_ORACLE["link_reciprocity"] = """
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
           'h' || CAST((doc_id % 20 * 7 + 3) % 20 AS VARCHAR) AS dst
    FROM documents WHERE doc_id < 500
    UNION ALL
    SELECT 'h' || CAST(doc_id % 20 AS VARCHAR),
           'h' || CAST((doc_id % 20 * 3 + 1) % 20 AS VARCHAR)
    FROM documents WHERE doc_id < 500
  ) WHERE src <> dst
)
SELECT e.src AS node,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(CASE WHEN EXISTS (
         SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal,
       ROUND(CAST(SUM(CASE WHEN EXISTS (
         SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src
       ) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS reciprocity
FROM e GROUP BY e.src
"""

_ORACLE["fetch_schedule"] = """
WITH f AS (
  SELECT doc_id % 20 AS m,
         'h' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host,
         'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id < 500
), s AS (
  SELECT host, url, m,
         CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
              AS BIGINT) AS position
  FROM f
)
SELECT host, url, position,
       CAST(position - 1 AS DOUBLE)
         * (CASE WHEN m % 2 = 0 THEN CAST(m // 2 AS DOUBLE) + 0.5
                 ELSE 1.0 END) AS fetch_offset_s
FROM s
"""

_ORACLE["change_rate"] = """
WITH o AS (
  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(v * ((doc_id % 3 + 1) * 10) AS DOUBLE) AS ts,
         CASE WHEN doc_id % 7 = 0 THEN 'same'
              ELSE 'd' || CAST(v // (doc_id % 4 + 1) AS VARCHAR) END AS digest
  FROM documents, unnest(generate_series(0, doc_id % 6)) AS t(v)
  WHERE doc_id < 300
), lagd AS (
  SELECT url, ts, digest,
         LAG(digest) OVER (PARTITION BY url ORDER BY ts) AS prev
  FROM o
), agg AS (
  SELECT url,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_intervals,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND digest <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         CAST(MAX(ts) - MIN(ts) AS DOUBLE) AS span
  FROM lagd GROUP BY url
), lam AS (
  SELECT *,
         CASE WHEN n_intervals > 0 AND span > 0 THEN
           LN((CAST(n_intervals AS DOUBLE) + 0.5)
              / (CAST(n_intervals - n_changes AS DOUBLE) + 0.5))
             / (span / n_intervals)
         END AS raw_rate
  FROM agg
)
SELECT url, n_obs, n_intervals, n_changes, span,
       ROUND(raw_rate, 4) AS change_rate,
       ROUND(CASE WHEN n_changes > 0 THEN 1.0 / raw_rate END, 4)
         AS revisit_after
FROM lam
"""

# Winnowing fingerprint chain (Schleimer et al. 2003), shared by the
# winnow_fingerprint and winnow_overlap oracles: 32-bit md5 token codes,
# degree-4 polynomial k-gram hashes (base 33, unrolled — max < 2^53 so
# int64 is exact), window-of-4 minima with the rightmost-min tiebreak
# (last index of the min = len - position(reverse, min) + 1).
_WINNOW_CTES = """
  SELECT doc_id,
         list_transform(
           list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       x -> x <> ''),
           x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS codes
  FROM documents WHERE text IS NOT NULL{pred}
), g AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(codes) - 4),
      i -> codes[i]*1185921 + codes[i+1]*35937 + codes[i+2]*1089
           + codes[i+3]*33 + codes[i+4]) AS grams
  FROM c WHERE len(codes) >= 5
), w AS (
  SELECT doc_id,
    list_transform(generate_series(1, greatest(len(grams) - 3, 1)),
      j -> {'pos': CAST(j + len(list_slice(grams, j, j+3))
                   - list_position(list_reverse(list_slice(grams, j, j+3)),
                                   list_min(list_slice(grams, j, j+3)))
                   AS BIGINT),
            'fp': list_min(list_slice(grams, j, j+3))}) AS fps
  FROM g WHERE len(grams) >= 1
)"""

_ORACLE["winnow_fingerprint"] = (
    "WITH c AS ("
    + _WINNOW_CTES.replace("{pred}", " AND doc_id < 300")
    + """
SELECT DISTINCT doc_id, u.fps.pos AS pos, u.fps.fp AS fp
FROM w, unnest(fps) AS u
"""
)

_ORACLE["winnow_overlap"] = (
    "WITH c AS ("
    + _WINNOW_CTES.replace("{pred}", "")
    + """, u AS (
  SELECT DISTINCT doc_id, un.fps.fp AS fp FROM w, unnest(fps) AS un
), rare AS (
  SELECT fp FROM u GROUP BY fp HAVING count(*) <= 50
), k AS (
  SELECT doc_id, fp FROM u JOIN rare USING (fp)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""
)

_PR_CTES, _PR_FINAL = _pagerank_oracle(as_cte=True)
_ORACLE["frontier_build"] = f"""{_PR_CTES},
f AS (
  -- closed form: the twice-planted seed collapses to one row per doc
  -- (url_dedup_first), '/blocked*' kills doc_id MOD 3 == 0
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host,
         (doc_id % 3) <> 0 AS allowed
  FROM documents WHERE doc_id < 500
), stats AS (
  SELECT host,
         CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_allowed,
         CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_blocked
  FROM f GROUP BY 1
)
SELECT stats.host AS host, n_allowed, n_blocked,
       ROUND({_PR_FINAL}.rank, 6) AS rank
FROM stats JOIN {_PR_FINAL} ON stats.host = {_PR_FINAL}.node || '.example'
"""


_ORACLE["recrawl_priority"] = f"""{_PR_CTES},
o AS (
  SELECT 'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         'h' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host,
         CAST(v * ((doc_id % 3 + 1) * 10) AS DOUBLE) AS ts,
         CASE WHEN doc_id % 7 = 0 THEN 'same'
              ELSE 'd' || CAST(v // (doc_id % 4 + 1) AS VARCHAR)
         END AS digest
  FROM documents, unnest(generate_series(0, doc_id % 6)) AS t(v)
  WHERE doc_id < 300
), lagd AS (
  SELECT url, host, ts, digest,
         LAG(digest) OVER (PARTITION BY url ORDER BY ts) AS prev
  FROM o
), agg AS (
  SELECT url, host,
         CAST(SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_intervals,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND digest <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         CAST(MAX(ts) - MIN(ts) AS DOUBLE) AS span
  FROM lagd GROUP BY url, host
), cr AS (
  SELECT url, host,
    ROUND(CASE WHEN n_intervals > 0 AND span > 0 THEN
      LN((CAST(n_intervals AS DOUBLE) + 0.5)
         / (CAST(n_intervals - n_changes AS DOUBLE) + 0.5))
        / (span / n_intervals) END, 4) AS change_rate
  FROM agg
)
SELECT cr.url, cr.host, cr.change_rate,
       ROUND({_PR_FINAL}.rank, 6) AS rank,
       ROUND(ROUND({_PR_FINAL}.rank, 6) * COALESCE(cr.change_rate, 0.0), 6)
         AS priority
FROM cr JOIN {_PR_FINAL} ON cr.host = {_PR_FINAL}.node || '.example'
"""


def _hits_oracle(iters: int = 3, n: int = 20) -> str:
    """Unrolled HITS rounds with per-round L1 normalizers (cross-joined
    1-row sums), mirroring graph.hits exactly."""
    sql = f"""WITH e AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
         'h' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
  FROM documents WHERE doc_id < 500
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), h0 AS (SELECT node, {1.0 / n!r} AS h FROM nodes)"""
    prev_h = "h0"
    for i in range(1, iters + 1):
        sql += f""",
ar{i} AS (
  SELECT e.dst AS node, SUM(p.h) AS raw
  FROM e JOIN {prev_h} p ON e.src = p.node GROUP BY 1
), a{i} AS (
  SELECT nodes.node, COALESCE(ar{i}.raw, 0.0) / z.z AS a
  FROM nodes LEFT JOIN ar{i} USING (node),
       (SELECT SUM(raw) AS z FROM ar{i}) z
), hr{i} AS (
  SELECT e.src AS node, SUM(a{i}.a) AS raw
  FROM e JOIN a{i} ON e.dst = a{i}.node GROUP BY 1
), h{i} AS (
  SELECT nodes.node, COALESCE(hr{i}.raw, 0.0) / z.z AS h
  FROM nodes LEFT JOIN hr{i} USING (node),
       (SELECT SUM(raw) AS z FROM hr{i}) z
)"""
        prev_h = f"h{i}"
    return sql + f"""
SELECT h{iters}.node, ROUND(h{iters}.h, 6) AS hub,
       ROUND(a{iters}.a, 6) AS authority
FROM h{iters} JOIN a{iters} USING (node)"""


_ORACLE["hits_hosts"] = _hits_oracle()

_ORACLE["pack_manifest"] = r"""
WITH d AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 4
      AS shard,
    len(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS t
  FROM documents WHERE doc_id < 500
), c AS (
  SELECT *, COALESCE(SUM(t) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM d
), p AS (
  SELECT shard, doc_id, t, CAST(FLOOR(cum / 500.0) AS BIGINT) AS pack_id,
    COALESCE(SUM(t) OVER (
      PARTITION BY shard, CAST(FLOOR(cum / 500.0) AS BIGINT)
      ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM c
)
SELECT shard, pack_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(t) AS BIGINT) AS pack_tokens,
  array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')
    AS doc_ids,
  array_to_string(list(CAST(off AS VARCHAR) ORDER BY doc_id), ',')
    AS offsets
FROM p GROUP BY 1, 2
"""

_ORACLE["shard_checksums"] = """
WITH r AS (
  SELECT
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8
      AS shard,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31)
                            || COALESCE(text, '')), 1, 15) AS BIGINT) AS h
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows, bit_xor(h) AS checksum
FROM r GROUP BY 1
"""

_ORACLE["lang_id_margin"] = rf"""
WITH hits AS (
  SELECT doc_id,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['en']})) AS h_en,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['de']})) AS h_de,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['fr']})) AS h_fr,
    len(list_intersect(regexp_split_to_array(trim(text), '\s+'), {_SW['es']})) AS h_es
  FROM documents
), ranked AS (
  SELECT doc_id, h_en, h_de, h_fr, h_es,
         list_sort([h_en, h_de, h_fr, h_es]) AS a
  FROM hits
)
SELECT doc_id,
  CASE
    WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
    WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
    WHEN h_en >= h_de THEN 'en'
    ELSE 'de' END AS pred_lang,
  CAST(a[4] AS BIGINT) AS pred_hits,
  CAST(a[4] - a[3] AS BIGINT) AS margin,
  (a[4] - a[3]) >= 2 AS confident
FROM ranked
"""

_ORACLE["main_content"] = f"""
WITH pages AS (
  SELECT doc_id,
    '<html><head><script>nav()</script></head><body>'
    || '<div><a href="/">home</a> | <a href="/about">about</a> | '
    || '<a href="/contact">contact us</a></div><p>' || text
    || '</p><p>a second paragraph of genuine prose content long '
    || 'enough to clear the bar for doc ' || CAST(doc_id AS VARCHAR)
    || '.</p><div>read more: <a href="/a">related story one</a> '
    || '<a href="/b">related story two</a></div>'
    || '<footer><a href="/tos">terms</a> '
    || '<a href="/priv">privacy</a></footer></body></html>' AS html
  FROM documents
), prep AS (
  SELECT doc_id,
    regexp_split_to_array(
      regexp_replace(
        regexp_replace(lower(html), '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '{_BLOCK_SPLIT_RE}') AS blocks
  FROM pages
), scored AS (
  SELECT doc_id,
    list_transform(blocks, b -> struct_pack(
      t := trim(regexp_replace(regexp_replace(b, '(?s)<[^>]*>', ' ', 'g'),
                               '\\s+', ' ', 'g')),
      lc := COALESCE(list_sum(list_transform(
              regexp_extract_all(b, '{_ANCHOR_TEXT_RE}', 1),
              a -> length(trim(regexp_replace(
                     regexp_replace(a, '(?s)<[^>]*>', ' ', 'g'),
                     '\\s+', ' ', 'g'))))), 0)
    )) AS s
  FROM prep
), kept AS (
  SELECT doc_id, s,
    list_filter(s, x -> length(x.t) >= 25
                    AND x.lc / GREATEST(length(x.t), 1) <= 0.33) AS k
  FROM scored
)
SELECT doc_id,
       CAST(len(s) AS BIGINT) AS n_blocks,
       CAST(len(k) AS BIGINT) AS n_kept,
       array_to_string(list_transform(k, x -> x.t), chr(10)) AS main_text
FROM kept
"""

_ORACLE["near_dup_keep_best"] = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, {_NORM_TEXT} AS norm FROM documents WHERE doc_id < 50
), corpus AS (
  SELECT doc_id, norm FROM base
  UNION ALL SELECT doc_id + 100000, norm FROM base
  UNION ALL SELECT doc_id + 200000, norm FROM base
), toks AS (
  SELECT doc_id, string_split(norm, ' ') AS t FROM corpus
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sig AS (
  SELECT doc_id, {_MH_ALL}
  FROM grams GROUP BY doc_id
), bands AS (
  {_BAND_SELECTS}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
), assign AS (
  SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY 1
), r AS (
  SELECT cluster_id, doc_id, CAST(doc_id % 7 AS DOUBLE) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY cluster_id
           ORDER BY CAST(doc_id % 7 AS DOUBLE) DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n
  FROM assign
)
SELECT cluster_id, doc_id, score, CAST(n AS BIGINT) AS n_members
FROM r WHERE rk = 1
"""

_ORACLE["snapshot_drift"] = r"""
WITH ob AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 512 AS bucket
  FROM documents,
       UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) u(tok)
  WHERE doc_id < 250
), nb AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 512 AS bucket
  FROM documents,
       UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) u(tok)
  WHERE doc_id >= 250 AND doc_id < 500
), oc AS (SELECT bucket, COUNT(*) AS c_old FROM ob GROUP BY 1),
   nc AS (SELECT bucket, COUNT(*) AS c_new FROM nb GROUP BY 1),
   toc AS (SELECT SUM(c_old) AS t FROM oc),
   tnc AS (SELECT SUM(c_new) AS t FROM nc),
   j AS (
     SELECT COALESCE(oc.bucket, nc.bucket) AS bucket,
            COALESCE(oc.c_old, 0) AS c_old, COALESCE(nc.c_new, 0) AS c_new,
            (COALESCE(oc.c_old, 0) + 1.0) / (toc.t + 512.0) AS po,
            (COALESCE(nc.c_new, 0) + 1.0) / (tnc.t + 512.0) AS pn
     FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket, toc, tnc
   )
SELECT bucket, CAST(c_old AS BIGINT) AS c_old, CAST(c_new AS BIGINT) AS c_new,
       ROUND(po, 6) AS p_old, ROUND(pn, 6) AS p_new,
       ROUND(pn * ln(pn / po), 6) AS kl_term
FROM j
"""

_ORACLE["robots_meta"] = f"""
WITH pages AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 4 = 0 THEN
        '<html><head><meta name="robots" content="noindex, nofollow">'
        || '<link rel="canonical" href="https://canon.example/'
        || CAST(doc_id AS VARCHAR) || '"></head><body>' || text
        || '</body></html>'
      WHEN doc_id % 4 = 1 THEN
        '<html><head><meta content="nofollow" name="robots"></head><body>'
        || text || '</body></html>'
      WHEN doc_id % 4 = 2 THEN
        '<html><head><link rel="canonical" href="https://canon.example/c'
        || CAST(doc_id AS VARCHAR) || '"></head><body>' || text
        || '</body></html>'
      ELSE '<html><body>' || text || '</body></html>'
    END AS html
  FROM documents
), lowered AS (
  SELECT doc_id, lower(html) AS t FROM pages
), sig AS (
  SELECT doc_id,
    COALESCE(
      NULLIF(regexp_extract(t, '{_sqlq(_ROBOTS_CONTENT_RE)}', 1), ''),
      NULLIF(regexp_extract(t, '{_sqlq(_ROBOTS_CONTENT_FIRST_RE)}', 1), ''),
      '') AS robots_content,
    regexp_extract(t, '{_sqlq(_CANONICAL_RE)}', 1) AS canonical_url
  FROM lowered
)
SELECT doc_id, robots_content,
       contains(robots_content, 'noindex') AS noindex,
       contains(robots_content, 'nofollow') AS nofollow,
       canonical_url,
       NOT contains(robots_content, 'noindex') AS indexable
FROM sig
"""

_ORACLE["bigram_logprob"] = f"""
WITH docs AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS t
  FROM documents
), toks AS (
  SELECT doc_id, i AS pos, t[i] AS token,
         CASE WHEN i > 1 THEN t[i-1] END AS prev
  FROM docs, UNNEST(generate_series(1, len(t))) u(i)
), uni AS (
  SELECT token, COUNT(*) AS c_uni FROM toks GROUP BY 1
), tot AS (SELECT SUM(c_uni) AS total FROM uni),
bi AS (
  SELECT prev, token, COUNT(*) AS c_bi FROM toks
  WHERE prev IS NOT NULL GROUP BY 1, 2
), scored AS (
  SELECT tk.doc_id,
    CASE WHEN tk.prev IS NULL
      THEN ln(u.c_uni / tot.total)
      ELSE ln({0.7!r} * (COALESCE(b.c_bi, 0) / up.c_uni)
              + {1.0 - 0.7!r} * (u.c_uni / tot.total))
    END AS lp
  FROM toks tk
  JOIN uni u USING (token)
  LEFT JOIN uni up ON up.token = tk.prev
  LEFT JOIN bi b ON b.prev = tk.prev AND b.token = tk.token, tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(lp), 4) AS mean_logprob
FROM scored GROUP BY 1
"""

_ORACLE["idn_homograph"] = """
WITH d AS (
  SELECT doc_id, doc_id % 5 AS m
  FROM documents WHERE doc_id < 500
), v AS (
  SELECT doc_id,
    CASE m WHEN 0 THEN 'paypa1.com' WHEN 1 THEN 'www.g00gle.net'
           WHEN 2 THEN 'paypal.com' WHEN 3 THEN 'xn--pple-43d.com'
           ELSE 'news.example.org' END AS host,
    CASE m WHEN 0 THEN 'paypa1' WHEN 1 THEN 'g00gle'
           WHEN 2 THEN 'paypal' WHEN 3 THEN 'xn--pple-43d'
           ELSE 'example' END AS label,
    (m = 3) AS has_punycode
  FROM d
), f AS (
  SELECT *, translate(label, '013457', 'oleast') AS folded FROM v
), nb AS (
  SELECT doc_id, b.brand, levenshtein(folded, b.brand) AS dist
  FROM f, (SELECT UNNEST(['amazon', 'apple', 'google', 'microsoft',
                          'paypal', 'wikipedia']) AS brand) b
), best AS (
  SELECT doc_id, brand AS nearest_brand, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY dist, brand) AS rn
  FROM nb
)
SELECT v.doc_id, host, label, has_punycode,
       nearest_brand, CAST(dist AS INTEGER) AS distance,
       (dist <= 1 AND label <> nearest_brand) AS lookalike
FROM v JOIN best USING (doc_id) WHERE rn = 1
"""

_ORACLE["search_terms"] = """
WITH e AS (
  SELECT event_id % 5 AS m, event_id % 9 AS t FROM events
), rows_ AS (
  SELECT CASE WHEN m = 0 THEN 'google' WHEN m = 1 THEN 'bing'
              ELSE 'other' END AS engine,
         CASE WHEN m IN (0, 1) THEN 'term ' || CAST(t AS VARCHAR)
              ELSE 'x%20y' END AS term
  FROM e WHERE m IN (0, 1, 3)
)
SELECT engine, term, COUNT(*) AS hits FROM rows_ GROUP BY engine, term
"""

_ORACLE["canonical_pick"] = """
WITH pages AS (
  SELECT 'https://ex/p/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 3 = 1
                THEN 'https://canon/' || CAST(doc_id // 10 AS VARCHAR)
              WHEN doc_id % 3 = 2 THEN '' END AS canonical_url,
         CAST((doc_id * 13) % 50 AS DOUBLE) AS quality
  FROM documents WHERE doc_id < 400
), keyed AS (
  SELECT *,
         CASE WHEN canonical_url IS NOT NULL AND canonical_url <> ''
              THEN canonical_url ELSE url END AS canonical_key
  FROM pages
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY canonical_key
                            ORDER BY quality DESC, url) AS rk,
         COUNT(*) OVER (PARTITION BY canonical_key) AS cluster_size
  FROM keyed
)
SELECT canonical_key, url, quality,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rk = 1
"""

_ORACLE["hreflang_clusters"] = """
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS k, doc_id % 3 AS m
  FROM documents WHERE doc_id < 400
)
SELECT doc_id, 'en' AS hreflang, 'https://ex/en/' || k AS href
FROM d WHERE m = 0
UNION ALL
SELECT doc_id, 'fr-fr', 'https://ex/fr/' || k FROM d WHERE m = 0
UNION ALL
SELECT doc_id, 'de', 'https://ex/de/' || k FROM d WHERE m = 1
"""

_ORACLE["ndcg_eval"] = """
WITH d AS (
  SELECT 'q' || CAST(doc_id % 5 AS VARCHAR) AS query_id,
         doc_id, CAST((doc_id * 7) % 100 AS DOUBLE) AS score,
         doc_id % 4 AS rel
  FROM documents WHERE doc_id < 200
), r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS rk,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rel DESC, doc_id) AS irk
  FROM d
), g AS (
  SELECT query_id,
    SUM(CASE WHEN rk <= 10
             THEN (pow(2.0, rel) - 1) / log2(rk + 1.0) ELSE 0.0 END)
      AS dcg,
    SUM(CASE WHEN irk <= 10
             THEN (pow(2.0, rel) - 1) / log2(irk + 1.0) ELSE 0.0 END)
      AS idcg
  FROM r GROUP BY query_id
)
SELECT query_id, ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
       ROUND(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg
FROM g
"""

_ORACLE["zscore_spikes"] = """
WITH keyed AS (
  SELECT 'u' || CAST(user_id % 10 AS VARCHAR) AS key,
         CAST(CASE WHEN event_id % 50 < 20 THEN 0
                   ELSE event_id % 24 END AS BIGINT) AS bucket
  FROM events
), counts AS (
  SELECT key, bucket, COUNT(*) AS c FROM keyed GROUP BY 1, 2
), moments AS (
  SELECT key, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
  FROM counts GROUP BY key
), z AS (
  SELECT counts.key, bucket, c,
         CAST(s1 AS DOUBLE) / n AS mean,
         CASE WHEN n >= 3
               AND (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) > 0
              THEN (c - CAST(s1 AS DOUBLE) / n)
                   / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
         END AS zv
  FROM counts JOIN moments USING (key)
)
SELECT key, bucket, CAST(c AS BIGINT) AS c,
       ROUND(mean, 4) AS mean, ROUND(zv, 4) AS z,
       COALESCE(zv >= 3.0, FALSE) AS is_spike
FROM z
"""

_ORACLE["key_skew"] = """
WITH keyed AS (
  SELECT CASE WHEN user_id % 100 < 50 THEN 'hot'
              ELSE 'h' || CAST(user_id % 100 AS VARCHAR) END AS key
  FROM events
), counts AS (
  SELECT key, COUNT(*) AS n_rows FROM keyed GROUP BY key
), totals AS (
  SELECT SUM(n_rows) AS total, COUNT(*) AS n_distinct FROM counts
), top AS (
  SELECT key, n_rows,
         ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rank
  FROM counts
)
SELECT CAST(rank AS BIGINT) AS rank, key,
       CAST(n_rows AS BIGINT) AS n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / total, 6) AS share,
       ROUND(n_rows / (CAST(total AS DOUBLE) / n_distinct), 6)
         AS imbalance
FROM top, totals WHERE rank <= 5
"""

_ORACLE["sitemap_tree"] = """
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS k, doc_id % 3 AS m
  FROM documents WHERE doc_id < 500
)
SELECT 's' || k || '.example' AS host,
       CASE m WHEN 0 THEN 'index' WHEN 1 THEN 'urlset'
              ELSE 'unknown' END AS kind,
       CAST(p AS BIGINT) AS position,
       CASE WHEN m = 0 AND p = 1
              THEN 'https://s' || k || '.example/sm1.xml'
            WHEN m = 0 AND p = 2
              THEN 'https://s' || k || '.example/sm2.xml'
            WHEN m = 1 AND p = 1
              THEN 'https://s' || k || '.example/a/' || k
            WHEN m = 1 AND p = 2
              THEN 'https://s' || k || '.example/b/' || k
            ELSE 'https://s' || k || '.example/x' END AS loc
FROM d, unnest(generate_series(1, CASE WHEN m = 2 THEN 1 ELSE 2 END)) t(p)
"""

_ORACLE["meta_refresh"] = """
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS k, doc_id % 4 AS m
  FROM documents
)
SELECT doc_id,
       CAST(CASE m WHEN 0 THEN 0 WHEN 1 THEN 5 END AS INTEGER)
         AS refresh_seconds,
       CASE m WHEN 0 THEN 'https://t.example/r' || k
              WHEN 1 THEN '/local/' || k END AS refresh_target
FROM d WHERE m IN (0, 1)
"""

_ORACLE["build_postings"] = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+'))
           AS token
  FROM documents WHERE doc_id < 200
), tf AS (
  SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY token
                               ORDER BY tf DESC, doc_id) AS rk
  FROM tf
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df_docs,
       COALESCE(string_agg(
         CASE WHEN rk <= 3
              THEN CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
         END, ',' ORDER BY tf DESC, doc_id), '') AS postings
FROM ranked GROUP BY token
"""

_ORACLE["bot_signals"] = """
WITH m AS (
  SELECT '192.0.2.' || CAST(user_id % 200 AS VARCHAR) AS host,
         '/' || event_type || '/' || CAST(event_id AS VARCHAR) AS uri,
         200 + (event_id % 4) * 100 AS status,
         event_id % 7 AS uam
  FROM events WHERE event_id % 10 <> 0
), agg AS (
  SELECT host, COUNT(*) AS n_req, COUNT(DISTINCT uri) AS n_uris,
         MAX(CASE WHEN uam IN (0, 1) THEN 1 ELSE 0 END) AS ua_bot_i,
         SUM(CASE WHEN status >= 400 THEN 1 ELSE 0 END) AS errs
  FROM m GROUP BY host
), sc AS (
  SELECT *,
         ua_bot_i
         + (CASE WHEN n_req >= 10 AND n_uris >= 0.8 * n_req
                 THEN 1 ELSE 0 END)
         + (CASE WHEN errs >= 0.5 * n_req THEN 1 ELSE 0 END) AS score
  FROM agg
)
SELECT host,
       CAST(n_req AS BIGINT) AS n_req,
       CAST(n_uris AS BIGINT) AS n_uris,
       ROUND(CAST(n_uris AS DOUBLE) / n_req, 6) AS uri_diversity,
       ROUND(CAST(errs AS DOUBLE) / n_req, 6) AS err_ratio,
       (ua_bot_i = 1) AS ua_bot,
       CAST(score AS INTEGER) AS bot_score,
       (score >= 2) AS is_bot
FROM sc
"""

_ORACLE["triangle_counts"] = """
WITH e0 AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
         'h' || CAST((doc_id % 20 * 7 + 3) % 20 AS VARCHAR) AS dst
  FROM documents WHERE doc_id < 500
  UNION ALL
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR),
         'h' || CAST((doc_id % 20 * 3 + 1) % 20 AS VARCHAR)
  FROM documents WHERE doc_id < 500
), e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
  ) WHERE src <> dst
), canon AS (
  SELECT src, dst FROM e WHERE src < dst
), tri AS (
  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
  FROM canon ab
  JOIN canon bc ON bc.src = ab.dst
  JOIN canon ac ON ac.src = ab.src AND ac.dst = bc.dst
), per AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
), deg AS (
  SELECT src AS node, COUNT(*) AS degree FROM e GROUP BY src
)
SELECT deg.node,
       CAST(degree AS BIGINT) AS degree,
       CAST(COALESCE(t, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN degree >= 2
                  THEN 2.0 * COALESCE(t, 0) / (degree * (degree - 1.0))
                  ELSE 0.0 END, 6) AS clustering
FROM deg LEFT JOIN per USING (node)
"""

_ORACLE["page_meta"] = """
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS k, doc_id % 4 AS m
  FROM documents
)
SELECT doc_id,
  CASE m WHEN 0 THEN 'Doc ' || k || ' overview'
         WHEN 1 THEN 'T' || k
         WHEN 2 THEN '404 Not Found' END AS title,
  CASE m WHEN 0 THEN 'desc ' || k WHEN 1 THEN 'd2 ' || k END
    AS meta_description,
  CASE m WHEN 0 THEN 'OG ' || k WHEN 1 THEN 'og2 ' || k END AS og_title,
  CASE m WHEN 0 THEN 'en-us' WHEN 2 THEN 'en' END AS html_lang,
  CAST(CASE m WHEN 0 THEN 13 + length(k) WHEN 1 THEN 1 + length(k)
              WHEN 2 THEN 13 ELSE 0 END AS INTEGER) AS title_chars,
  -- the heuristic also fires when the doc number itself contains '404'
  -- (e.g. 'Doc 404 overview') — that IS the operator's contract
  CASE WHEN m = 2 THEN TRUE
       WHEN m IN (0, 1) THEN k LIKE '%404%'
       ELSE FALSE END AS looks_soft404
FROM d
"""

_ORACLE["weighted_sample"] = """
WITH d AS (
  SELECT doc_id, source,
         CAST(doc_id % 7 + 1 AS DOUBLE) AS weight,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM documents
), k AS (
  SELECT doc_id, source, weight,
         -ln((h + 1) / 1152921504606846977.0) / weight AS es
  FROM d
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY es, doc_id) AS rn
  FROM k
)
SELECT doc_id, source, weight, ROUND(es, 6) AS es_key
FROM r WHERE rn <= 10
"""

_ORACLE["trigram_backoff"] = f"""
WITH docs AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS t
  FROM documents
), toks AS (
  SELECT doc_id, i AS pos, t[i] AS token,
         CASE WHEN i > 1 THEN t[i-1] END AS prev,
         CASE WHEN i > 2 THEN t[i-2] END AS prev2
  FROM docs, UNNEST(generate_series(1, len(t))) u(i)
), uni AS (
  SELECT token, COUNT(*) AS c_uni FROM toks GROUP BY 1
), tot AS (SELECT SUM(c_uni) AS total FROM uni),
bi AS (
  SELECT prev, token, COUNT(*) AS c_bi FROM toks
  WHERE prev IS NOT NULL GROUP BY 1, 2
), tri AS (
  SELECT prev2, prev, token, COUNT(*) AS c_tri FROM toks
  WHERE prev2 IS NOT NULL GROUP BY 1, 2, 3
), scored AS (
  SELECT tk.doc_id,
    CASE
      WHEN tk.prev IS NULL THEN ln(u.c_uni / tot.total)
      WHEN tk.prev2 IS NULL THEN ln(
        CASE WHEN b.c_bi IS NOT NULL THEN b.c_bi / up.c_uni
             ELSE {0.4!r} * (u.c_uni / tot.total) END)
      ELSE ln(
        CASE WHEN tr.c_tri IS NOT NULL THEN tr.c_tri / ctx.c_bi
             ELSE {0.4!r} * (
               CASE WHEN b.c_bi IS NOT NULL THEN b.c_bi / up.c_uni
                    ELSE {0.4!r} * (u.c_uni / tot.total) END) END)
    END AS lp
  FROM toks tk
  JOIN uni u USING (token)
  LEFT JOIN uni up ON up.token = tk.prev
  LEFT JOIN bi b ON b.prev = tk.prev AND b.token = tk.token
  LEFT JOIN bi ctx ON ctx.prev = tk.prev2 AND ctx.token = tk.prev
  LEFT JOIN tri tr ON tr.prev2 = tk.prev2 AND tr.prev = tk.prev
                  AND tr.token = tk.token, tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(lp), 4) AS mean_logprob
FROM scored GROUP BY 1
"""

_ORACLE["cross_snapshot_bloom"] = f"""
WITH old_fp AS (
  SELECT DISTINCT md5({_NORM_TEXT}) AS fp
  FROM documents WHERE doc_id < 300 AND text IS NOT NULL
), nw AS (
  SELECT doc_id + 10000 AS doc_id, text, md5({_NORM_TEXT}) AS fp
  FROM documents
)
SELECT doc_id, text FROM nw
WHERE fp IS NULL OR fp NOT IN (SELECT fp FROM old_fp)
"""

_ORACLE["token_entropy"] = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(COALESCE(text, '')), '\s+'))
           AS token
  FROM documents
), pt AS (
  SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       COALESCE(ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 4), 0.0)
         AS entropy
FROM pt GROUP BY 1
"""


_ORACLE["surt_key"] = """
-- closed form: expected SURT per URL-shape variant, derived
-- independently from doc_id arithmetic (NOT a regex replay)
WITH d AS (
  SELECT doc_id,
         CAST(doc_id AS VARCHAR) AS k,
         CAST(doc_id % 5 AS VARCHAR) AS h,
         doc_id % 6 AS v
  FROM documents WHERE doc_id < 500
)
SELECT doc_id,
  CASE v
    WHEN 0 THEN 'HTTPS://WWW.EX' || h || '.COM:443/a/' || k || '?b=2&a=1#frag'
    WHEN 1 THEN 'http://ex' || h || '.com:8080//a//' || k || '/'
    WHEN 2 THEN 'https://sub.ex' || h || '.org/'
    WHEN 3 THEN 'http://ex' || h || '.net'
    WHEN 4 THEN 'https://www.ex' || h || '.com/p/' || k || '?z=9&y=8&x=7'
    ELSE 'HTTP://EX' || h || '.COM:80/q/' || k || '#x'
  END AS url,
  CASE v
    WHEN 0 THEN 'com,ex' || h || ')/a/' || k || '?a=1&b=2'
    WHEN 1 THEN 'com,ex' || h || ':8080)/a/' || k
    WHEN 2 THEN 'org,ex' || h || ',sub)/'
    WHEN 3 THEN 'net,ex' || h || ')/'
    WHEN 4 THEN 'com,ex' || h || ')/p/' || k || '?x=7&y=8&z=9'
    ELSE 'com,ex' || h || ')/q/' || k
  END AS surt
FROM d
"""

_ORACLE["cdxj_scan"] = """
-- closed form: states what each synthesized index line encodes; the
-- two malformed variants (no ts / JSON without url) must come back
-- all-NULL with valid=false and the raw line intact
WITH d AS (
  SELECT doc_id,
         CAST(doc_id AS VARCHAR) AS k,
         CAST(doc_id % 5 AS VARCHAR) AS h,
         '20240101' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
           || lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
           || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ts14,
         octet_length(encode(COALESCE(text, ''))) AS blen
  FROM documents WHERE doc_id < 500
), built AS (
  SELECT doc_id, k, h, ts14, blen,
         'com,ex' || h || ')/p/' || k AS surt,
         '{"url": "https://ex' || h || '.com/p/' || k
           || '", "mime": "text/html", "status": 200, "digest": "sha1:'
           || k || '", "length": "' || CAST(blen AS VARCHAR)
           || '", "offset": "' || CAST(doc_id * 100 AS VARCHAR)
           || '", "filename": "crawl-' || CAST(doc_id % 10 AS VARCHAR)
           || '.warc.gz"}' AS js
  FROM d
)
SELECT
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE surt END AS surt,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE ts14 END AS ts14,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
       ELSE 'https://ex' || h || '.com/p/' || k END AS url,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 'text/html' END AS mime,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
       ELSE CAST(200 AS BIGINT) END AS status,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
       ELSE CAST(blen AS BIGINT) END AS length,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
       ELSE CAST(doc_id * 100 AS BIGINT) END AS "offset",
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
       ELSE 'sha1:' || k END AS digest,
  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
       ELSE 'crawl-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz'
  END AS filename,
  doc_id % 10 NOT IN (0, 5) AS valid,
  CASE WHEN doc_id % 10 = 0 THEN 'bad line ' || k
       WHEN doc_id % 10 = 5 THEN surt || ' ' || ts14 || ' {"mime": "x"}'
       ELSE surt || ' ' || ts14 || ' ' || js
  END AS raw
FROM built
"""


_ORACLE["bm25_topic"] = r"""
-- full arithmetic replay of retrieval.bm25_score for the literal query
-- ['spark','window','merge']; constants written symbolically so both
-- engines fold identical doubles before ROUND(.,4)
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS t
  FROM documents
), proj AS (
  SELECT doc_id, len(t) AS dl,
         len(list_filter(t, x -> x = 'spark'))  AS tf0,
         len(list_filter(t, x -> x = 'window')) AS tf1,
         len(list_filter(t, x -> x = 'merge'))  AS tf2
  FROM toks
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM proj
)
SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
  ROUND(
    0.0
    + ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5))
      * (tf0 * (1.2 + 1.0))
      / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl * n_docs / sum_dl)))
    + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
      * (tf1 * (1.2 + 1.0))
      / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl * n_docs / sum_dl)))
    + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
      * (tf2 * (1.2 + 1.0))
      / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl * n_docs / sum_dl)))
  , 4) AS score
FROM proj, stats
"""

_ORACLE["threshold_sweep"] = """
WITH s AS (
  SELECT CAST((doc_id * 37) % 100 AS DOUBLE) / 100.0 AS score,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label
  FROM documents
), t(threshold) AS (
  VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.25 AS DOUBLE)),
         (CAST(0.5 AS DOUBLE)), (CAST(0.75 AS DOUBLE)),
         (CAST(0.9 AS DOUBLE))
), m AS (
  SELECT threshold,
    CAST(SUM(CASE WHEN score >= threshold AND label = 1
             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN score >= threshold AND label = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN score <  threshold AND label = 1
             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN score <  threshold AND label = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM t, s GROUP BY threshold
), pr AS (
  SELECT *,
    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS p,
    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS r
  FROM m
)
SELECT threshold, tp, fp, fn, tn,
  ROUND(p, 6) AS precision,
  ROUND(r, 6) AS recall,
  ROUND(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r) END, 6) AS f1
FROM pr
"""

_ORACLE["mixture_plan"] = r"""
WITH tc AS (
  SELECT 'd' || CAST(doc_id % 8 AS VARCHAR) AS domain,
         CAST(SUM(len(list_filter(
           regexp_split_to_array(trim(COALESCE(text, '')), '\s+'),
           t -> t <> ''))) AS DOUBLE) AS tok
  FROM documents GROUP BY 1
), w(domain, wt) AS (
  VALUES ('d0', 1.0), ('d1', 2.0), ('d2', 3.0), ('d3', 4.0),
         ('d4', 5.0), ('d5', 6.0), ('d9', 2.0)
), z AS (SELECT CAST(SUM(wt) AS DOUBLE) AS z FROM w),
j AS (
  SELECT COALESCE(tc.domain, w.domain) AS domain,
         COALESCE(tok, CAST(0.0 AS DOUBLE)) AS tok,
         CAST(COALESCE(wt, 0.0) AS DOUBLE) AS wt
  FROM tc FULL OUTER JOIN w ON tc.domain = w.domain
), t AS (
  SELECT domain, tok, wt,
         CAST(50000.0 AS DOUBLE) * wt / z.z AS target
  FROM j, z
), r AS (
  SELECT *, CASE WHEN tok > 0
                 THEN LEAST(CAST(1.0 AS DOUBLE), target / tok)
                 ELSE CAST(0.0 AS DOUBLE) END AS rate
  FROM t
)
SELECT domain, CAST(tok AS BIGINT) AS n_tokens, wt AS weight,
       ROUND(target, 4) AS target_tokens,
       ROUND(rate, 6) AS rate,
       ROUND(rate * tok, 4) AS expected_tokens,
       ROUND(GREATEST(target - tok, CAST(0.0 AS DOUBLE)), 4) AS shortfall,
       target > tok AS capped
FROM r
"""

def _label_prop_oracle(iters: int = 2) -> str:
    """Unrolled label-propagation CTE chain: per round, a neighbor-label
    count and a ROW_NUMBER argmax (count DESC, label ASC — the same
    majority/min-label tiebreak the operator's (-count, label) struct-min
    encodes), seeds clamped by the anti-join-style NOT IN."""
    sql = """WITH e0 AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
         'h' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
  FROM documents WHERE doc_id < 500
), e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0
    UNION ALL SELECT dst AS src, src AS dst FROM e0
  ) sym WHERE src <> dst
), s AS (
  SELECT node, MIN(label) AS label
  FROM (VALUES ('h0','good'), ('h7','spam'), ('h13','news'))
       AS t(node, label)
  GROUP BY 1
), l0 AS (SELECT node, label FROM s)"""
    prev = "l0"
    for i in range(1, iters + 1):
        sql += f""",
c{i} AS (
  SELECT e.dst AS node, p.label, COUNT(*) AS c
  FROM e JOIN {prev} p ON e.src = p.node GROUP BY 1, 2
), b{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM c{i}
  ) r WHERE rn = 1
), l{i} AS (
  SELECT node, label FROM s
  UNION ALL
  SELECT node, label FROM b{i} WHERE node NOT IN (SELECT node FROM s)
)"""
        prev = f"l{i}"
    sql += f"""
SELECT l.node, l.label, s.node IS NOT NULL AS is_seed
FROM {prev} l LEFT JOIN s ON l.node = s.node"""
    return sql


_ORACLE["label_prop_hosts"] = _label_prop_oracle()

_ORACLE["redirect_chains"] = """
WITH m0 AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
         CASE WHEN doc_id % 97 = 13 THEN 'u' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 5 = 0 THEN 'f' || CAST(doc_id AS VARCHAR)
              ELSE 'u' || CAST(doc_id - 1 AS VARCHAR) END AS dst
  FROM documents WHERE doc_id < 400
), m AS (SELECT src, MIN(dst) AS dst FROM m0 GROUP BY 1),
r0 AS (SELECT src AS url, dst AS cur, 1 AS hops FROM m),
r1 AS (SELECT r0.url, COALESCE(m.dst, r0.cur) AS cur,
              CASE WHEN m.src IS NOT NULL THEN r0.hops + 1
                   ELSE r0.hops END AS hops
       FROM r0 LEFT JOIN m ON r0.cur = m.src),
r2 AS (SELECT r1.url, COALESCE(m.dst, r1.cur) AS cur,
              CASE WHEN m.src IS NOT NULL THEN r1.hops + 1
                   ELSE r1.hops END AS hops
       FROM r1 LEFT JOIN m ON r1.cur = m.src),
r3 AS (SELECT r2.url, COALESCE(m.dst, r2.cur) AS cur,
              CASE WHEN m.src IS NOT NULL THEN r2.hops + 1
                   ELSE r2.hops END AS hops
       FROM r2 LEFT JOIN m ON r2.cur = m.src)
SELECT r3.url, r3.cur AS final_url, r3.hops, m.src IS NULL AS resolved
FROM r3 LEFT JOIN m ON r3.cur = m.src
"""

_ORACLE["text_normalize"] = r"""
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') || ' Cafe' || chr(769) || '  x' || chr(7)
           || 'y  A' || chr(778) || 'b' AS txt
  FROM documents WHERE doc_id < 500
), n AS (
  SELECT doc_id, txt,
         trim(regexp_replace(regexp_replace(nfc_normalize(txt),
              '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
              '\s+', ' ', 'g')) AS norm_text
  FROM t
)
SELECT doc_id, norm_text, norm_text <> txt AS changed FROM n
"""

_ORACLE["url_templates"] = r"""
WITH u AS (
  SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example' ||
    CASE WHEN doc_id % 3 = 0
         THEN '/post/' || CAST(doc_id AS VARCHAR) || '/view'
         WHEN doc_id % 3 = 1
         THEN '/s/' || md5('x' || CAST(doc_id AS VARCHAR)) || '/x'
         ELSE '/about' END AS url
  FROM documents WHERE doc_id < 600
), t AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         regexp_replace(regexp_replace(
           regexp_replace(
             regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
             '[?#].*', ''),
           '[0-9a-f]{8,}', '{H}', 'g'), '[0-9]+', '{N}', 'g') AS template,
         url
  FROM u
), g AS (
  SELECT host, template, COUNT(*) AS n_urls,
         COUNT(DISTINCT url) AS n_distinct_urls
  FROM t GROUP BY 1, 2
)
SELECT host, template, CAST(n_urls AS BIGINT) AS n_urls,
       CAST(n_distinct_urls AS BIGINT) AS n_distinct_urls,
       (template LIKE '%{N}%' OR template LIKE '%{H}%') AS has_placeholder,
       ((template LIKE '%{N}%' OR template LIKE '%{H}%')
        AND n_distinct_urls >= 25) AS trap
FROM g
"""

_ORACLE["snapshot_diff"] = """
WITH o AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
         MIN(md5(COALESCE(text, ''))) AS old_digest
  FROM documents WHERE doc_id < 600 GROUP BY 1
), n AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
         MIN(md5(COALESCE(text, '')
             || CASE WHEN doc_id % 10 = 0 THEN 'v2' ELSE '' END))
           AS new_digest
  FROM documents WHERE doc_id >= 100 AND doc_id < 700 GROUP BY 1
)
SELECT COALESCE(o.url, n.url) AS url, o.old_digest, n.new_digest,
       CASE WHEN o.old_digest IS NULL THEN 'added'
            WHEN n.new_digest IS NULL THEN 'removed'
            WHEN o.old_digest <> n.new_digest THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n ON o.url = n.url
"""

_ORACLE["rate_limit_batch"] = """
WITH RECURSIVE req AS (
  SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
         'u' || CAST(event_id AS VARCHAR) AS url,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events WHERE event_id < 2000
), ev AS (
  SELECT host, url, ts_epoch,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY ts_epoch, url) AS rn
  FROM req
), walk(host, rn, url, ts_epoch, allowed, last_ok) AS (
  SELECT host, rn, url, ts_epoch, TRUE, ts_epoch FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.host, e.rn, e.url, e.ts_epoch,
         e.ts_epoch >= w.last_ok + 300,
         CASE WHEN e.ts_epoch >= w.last_ok + 300
              THEN e.ts_epoch ELSE w.last_ok END
  FROM ev e JOIN walk w ON e.host = w.host AND e.rn = w.rn + 1
)
SELECT host, url, ts_epoch, allowed FROM walk
"""

_ORACLE["http_status_route"] = """
WITH d AS (
  SELECT doc_id, doc_id % 5 AS m,
         octet_length(encode(
           '<html><body>' || COALESCE(text, '') || '</body></html>'
         )) AS blen
  FROM documents WHERE doc_id < 600
), r AS (
  SELECT CASE WHEN m IN (0, 1) THEN '2xx' WHEN m = 2 THEN '3xx'
              WHEN m = 3 THEN '4xx' ELSE 'unmatched' END AS status_class,
         CASE WHEN m = 1 THEN 'application/json'
              WHEN m = 4 THEN NULL ELSE 'text/html' END AS content_type,
         CASE WHEN m = 0 THEN 'utf-8' WHEN m = 3 THEN 'iso-8859-1'
              ELSE NULL END AS charset,
         CASE WHEN m = 2 THEN 1 ELSE 0 END AS redir,
         -- the garbage block is 'GARBAGE ' (8 octets) + the html
         CASE WHEN m = 4 THEN blen + 8 ELSE blen END AS body_bytes
  FROM d
)
SELECT status_class, content_type, charset,
       COUNT(*) AS n_records,
       CAST(SUM(redir) AS BIGINT) AS n_redirects,
       CAST(SUM(body_bytes) AS BIGINT) AS body_bytes
FROM r
GROUP BY status_class, content_type, charset
"""

_ORACLE["containment_dedup"] = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
), raw_t AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM base
), pl AS (
  SELECT doc_id + 10000 AS doc_id,
         array_to_string(t[1:GREATEST(len(t)//2, 1)], ' ') AS text
  FROM raw_t
), alld AS (
  SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM pl
), toks AS (
  SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS t FROM alld
), grams AS (
  SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  ROUND(c / LEAST(sa.n, sb.n), 6) AS overlap
FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(c / LEAST(sa.n, sb.n), 6) >= 0.9
"""

_ORACLE["image_dhash_dedup"] = r"""
WITH p AS (
  SELECT doc_id AS media_id,
         'img-' || CAST(doc_id % 60 AS VARCHAR) AS s
  FROM documents WHERE doc_id < 300
), hx AS (
  SELECT media_id, md5(s) || md5(s || chr(1)) || md5(s || chr(2))
         || md5(s || chr(3)) || md5(s || chr(4)) AS hexs
  FROM p
), px AS (
  SELECT media_id, list_transform(range(72), i ->
    16 * (strpos('0123456789abcdef', substr(hexs, (2*i + 1)::INT, 1)) - 1)
       + (strpos('0123456789abcdef', substr(hexs, (2*i + 2)::INT, 1)) - 1))
    AS g
  FROM hx
), b AS (
  SELECT media_id, list_transform(range(4), b -> CAST(list_sum(
      list_transform(range(16), j ->
        CASE WHEN g[(((b*16+j)//8)*9 + ((b*16+j)%8) + 2)::INT]
                > g[(((b*16+j)//8)*9 + ((b*16+j)%8) + 1)::INT]
             THEN (1::BIGINT << j::INT) ELSE 0::BIGINT END)) AS BIGINT))
    AS bands
  FROM px
), e AS (
  SELECT media_id, bands, generate_subscripts(bands, 1) AS bi,
         unnest(bands) AS bv
  FROM b
), cand AS (
  SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b,
         l.bands AS ba, r.bands AS bb
  FROM e l JOIN e r
    ON l.bi = r.bi AND l.bv = r.bv AND l.media_id < r.media_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
          + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4]))
         AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
    + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4])) <= 6
"""

_ORACLE["centroid_drift"] = r"""
WITH o AS (
  SELECT label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 250 AND label <> 3
), n AS (
  SELECT label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id >= 250 AND label <> 7
), oe AS (
  SELECT label, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM o
), ne AS (
  SELECT label, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM n
), oa AS (SELECT label, dim, SUM(x) AS s, COUNT(*) AS c FROM oe GROUP BY 1,2),
na AS (SELECT label, dim, SUM(x) AS s, COUNT(*) AS c FROM ne GROUP BY 1,2),
oc AS (SELECT label, CAST(MAX(c) AS BIGINT) AS n_old,
              list(s / c ORDER BY dim) AS a FROM oa GROUP BY 1),
nc AS (SELECT label, CAST(MAX(c) AS BIGINT) AS n_new,
              list(s / c ORDER BY dim) AS b FROM na GROUP BY 1)
SELECT CAST(COALESCE(oc.label, nc.label) AS INTEGER) AS "group",
       oc.n_old, nc.n_new,
       CASE WHEN oc.label IS NOT NULL AND nc.label IS NOT NULL THEN
         ROUND(list_dot_product(a, b)
               / (sqrt(list_dot_product(a, a))
                  * sqrt(list_dot_product(b, b))), 6)
       END AS cosine,
       CASE WHEN oc.label IS NOT NULL AND nc.label IS NOT NULL THEN
         ROUND(sqrt(list_sum(list_transform(list_zip(a, b),
                    s -> (s[1] - s[2]) * (s[1] - s[2])))), 6)
       END AS l2_dist
FROM oc FULL OUTER JOIN nc ON oc.label = nc.label
"""

_ORACLE["host_profile"] = r"""
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host,
         text,
         CASE WHEN doc_id % 9 = 0 THEN NULL ELSE lang END AS lang
  FROM documents
), hl AS (
  SELECT host, COALESCE(lang, 'und') AS lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(len(list_filter(
           regexp_split_to_array(trim(COALESCE(text, '')), '\s+'),
           t -> t <> ''))) AS BIGINT) AS tok
  FROM pages GROUP BY 1, 2
), top AS (
  SELECT host, lang AS top_lang, n AS top_n FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY host
                                 ORDER BY n DESC, lang ASC) AS rn
    FROM hl
  ) WHERE rn = 1
), tot AS (
  SELECT host, CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM hl GROUP BY 1
)
SELECT tot.host, n_docs, total_tokens,
       ROUND(CAST(total_tokens AS DOUBLE) / n_docs, 6) AS mean_doc_tokens,
       n_langs, top_lang,
       ROUND(CAST(top_n AS DOUBLE) / n_docs, 6) AS top_lang_frac
FROM tot JOIN top ON tot.host = top.host
"""

_ORACLE["degree_histogram"] = """
WITH e AS (
  SELECT 's' || CAST(doc_id % 11 AS VARCHAR) AS src,
         CASE WHEN doc_id % 3 = 0 THEN 'hub'
              ELSE 'h' || CAST(doc_id % 97 AS VARCHAR) END AS dst
  FROM documents WHERE doc_id < 1000
), din AS (SELECT dst AS node, COUNT(*) AS deg FROM e GROUP BY 1),
dout AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1)
SELECT 'in' AS direction,
       CAST(pow(2.0, FLOOR(LOG2(deg))) AS BIGINT) AS degree_bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM din GROUP BY 2
UNION ALL
SELECT 'out',
       CAST(pow(2.0, FLOOR(LOG2(deg))) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM dout GROUP BY 2
"""

_ORACLE["dup_profile"] = (
    r"""
WITH seeded AS (
  SELECT CASE WHEN doc_id % 7 = 0
              THEN '"""
    + " ".join(f"l{i}" for i in range(1, 21))
    + r""" ' || COALESCE(text, '')
              ELSE text END AS text
  FROM documents
), t AS (
  SELECT regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS ts,
         length(trim(COALESCE(text, ''))) > 0 AS has
  FROM seeded
), blk AS (
  SELECT array_to_string(list_slice(ts, (i - 1) * 20 + 1, i * 20), ' ')
           AS blk
  FROM t, unnest(generate_series(1, CAST(ceil(len(ts) / 20.0) AS INT)))
         AS g(i)
  WHERE has
), c AS (
  SELECT md5(blk) AS digest, COUNT(*) AS c FROM blk GROUP BY 1
), bs AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_blocks,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_blocks,
         CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_dup_occurrences,
         CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_block_df
  FROM c
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT n_docs, n_blocks, n_distinct_blocks, n_dup_occurrences,
       ROUND(CAST(n_dup_occurrences AS DOUBLE) / GREATEST(n_blocks, 1), 6)
         AS dup_block_frac,
       max_block_df
FROM nd, bs
"""
)

_ORACLE["registrable_domain"] = """
-- CLOSED-FORM: expected eTLD+1 per host shape (not a replay)
WITH h AS (
  SELECT doc_id % 6 AS c, CAST(doc_id % 50 AS VARCHAR) AS k
  FROM documents WHERE doc_id < 600
)
SELECT
  CASE c WHEN 0 THEN 'www.site' || k || '.com'
         WHEN 1 THEN 'a.b.shop' || k || '.co.uk'
         WHEN 2 THEN 'u' || k || '.github.io'
         WHEN 3 THEN 'co.uk'
         WHEN 4 THEN 'deep.x' || k || '.zz'
         ELSE 'blog' || k || '.blogspot.com' END AS host,
  CASE c WHEN 0 THEN 'site' || k || '.com'
         WHEN 1 THEN 'shop' || k || '.co.uk'
         WHEN 2 THEN 'u' || k || '.github.io'
         WHEN 3 THEN NULL
         WHEN 4 THEN 'x' || k || '.zz'
         ELSE 'blog' || k || '.blogspot.com' END AS domain
FROM h
"""

_ORACLE["anchor_stats"] = """
WITH e AS (
  SELECT 'https://t' || CAST(doc_id % 25 AS VARCHAR) || '.example/'
           AS target,
         CASE WHEN doc_id % 3 = 0 THEN 'click here'
              WHEN doc_id % 3 = 1
                THEN 'page ' || CAST(doc_id % 25 AS VARCHAR)
              ELSE '' END AS anchor,
         'h' || CAST(doc_id % 7 AS VARCHAR) AS src_host
  FROM documents WHERE doc_id < 500
), pa AS (
  SELECT target, anchor, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM e WHERE trim(anchor) <> '' GROUP BY target, anchor
), top AS (
  SELECT target, anchor AS top_anchor, cnt AS top_anchor_count FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY target
                                 ORDER BY cnt DESC, anchor ASC) AS rn
    FROM pa
  ) WHERE rn = 1
), pt AS (
  SELECT target, CAST(COUNT(*) AS BIGINT) AS n_links,
         CAST(COUNT(DISTINCT src_host) AS BIGINT) AS n_hosts
  FROM e GROUP BY target
)
SELECT pt.target, pt.n_links, pt.n_hosts, top.top_anchor,
       COALESCE(top.top_anchor_count, 0) AS top_anchor_count
FROM pt LEFT JOIN top ON pt.target = top.target
"""

_ORACLE["rrf_hybrid"] = r"""
-- replay BOTH hybrid-retrieval legs (BM25 chain as in bm25_topic;
-- exact cosine as in ann_cosine_topk) then the 1/(60+rank) fusion
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS t
  FROM documents
), proj AS (
  SELECT doc_id, len(t) AS dl,
         len(list_filter(t, x -> x = 'spark'))  AS tf0,
         len(list_filter(t, x -> x = 'window')) AS tf1,
         len(list_filter(t, x -> x = 'merge'))  AS tf2
  FROM toks
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM proj
), lex AS (
  SELECT doc_id,
    ROUND(
      0.0
      + ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5))
        * (tf0 * (1.2 + 1.0))
        / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl * n_docs / sum_dl)))
      + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
        * (tf1 * (1.2 + 1.0))
        / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl * n_docs / sum_dl)))
      + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
        * (tf2 * (1.2 + 1.0))
        / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl * n_docs / sum_dl)))
    , 4) AS score
  FROM proj, stats
), lexr AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM lex
  ) WHERE rank <= 20
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), semr AS (
  SELECT doc_id, rank FROM (
    SELECT c.vec_id AS doc_id,
      ROW_NUMBER() OVER (ORDER BY
        ROUND(list_dot_product(q.qv, c.embedding::DOUBLE[])
          / (sqrt(list_dot_product(q.qv, q.qv))
             * sqrt(list_dot_product(c.embedding::DOUBLE[],
                                     c.embedding::DOUBLE[]))), 6) DESC,
        c.vec_id ASC) AS rank
    FROM q, embeddings c WHERE c.vec_id <> 0
  ) WHERE rank <= 20
), u AS (
  SELECT doc_id, CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank) AS c
  FROM lexr
  UNION ALL
  SELECT doc_id, CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank) AS c
  FROM semr
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
       ROUND(SUM(c), 6) AS rrf_score
FROM u GROUP BY doc_id
"""


# --- round-4b SRE/analytics oracles -----------------------------------------

_ELB_SQL = "concat('app/lb', CAST(event_id % 3 AS VARCHAR), '/abc')"

_ORACLE["latency_percentiles"] = f"""
WITH m AS (
  SELECT {_ELB_SQL} AS elb, {_LAT_SQL} AS lat
  FROM events WHERE event_id % 10 <> 0
), a AS (
  SELECT elb, quantile_cont(lat, [0.5, 0.9, 0.99]) AS q, COUNT(*) AS n
  FROM m GROUP BY elb
)
SELECT elb, ROUND(q[1], 6) AS p50, ROUND(q[2], 6) AS p90,
       ROUND(q[3], 6) AS p99, CAST(n AS BIGINT) AS n
FROM a
"""

_ORACLE["latency_percentiles_kll"] = f"""
WITH m AS (
  SELECT {_ELB_SQL} AS elb, {_LAT_SQL} AS lat
  FROM events WHERE event_id % 10 <> 0
), a AS (
  SELECT elb, quantile_disc(lat, [0.5, 0.9, 0.99]) AS q, COUNT(*) AS n
  FROM m GROUP BY elb
)
SELECT elb, ROUND(q[1], 6) AS p50, ROUND(q[2], 6) AS p90,
       ROUND(q[3], 6) AS p99, CAST(n AS BIGINT) AS n
FROM a
"""

_ORACLE["apdex_report"] = f"""
WITH m AS (
  SELECT {_ELB_SQL} AS elb, {_LAT_SQL} AS lat
  FROM events WHERE event_id % 10 <> 0
), a AS (
  SELECT elb,
    SUM(CASE WHEN lat <= 0.25 THEN 1 ELSE 0 END) AS satisfied,
    SUM(CASE WHEN lat > 0.25 AND lat <= 1.0 THEN 1 ELSE 0 END) AS tolerating,
    COUNT(*) AS n
  FROM m GROUP BY elb
)
SELECT elb, CAST(satisfied AS BIGINT) AS satisfied,
  CAST(tolerating AS BIGINT) AS tolerating,
  CAST(n - satisfied - tolerating AS BIGINT) AS frustrated,
  CAST(n AS BIGINT) AS n,
  ROUND((CAST(satisfied AS DOUBLE) + CAST(tolerating AS DOUBLE) / 2.0)
        / CAST(n AS DOUBLE), 6) AS apdex
FROM a
"""

_WZ = 1.959963984540054
_WZ2 = _WZ * _WZ

_ORACLE["error_wilson"] = f"""
WITH m AS (
  SELECT event_type AS endpoint,
    CASE WHEN event_id % 4 = 3 THEN 1 ELSE 0 END AS err
  FROM events WHERE event_id % 10 <> 0
), a AS (
  SELECT endpoint, COUNT(*) AS n, SUM(err) AS errors FROM m GROUP BY endpoint
), c AS (
  SELECT endpoint, CAST(n AS BIGINT) AS n, CAST(errors AS BIGINT) AS errors,
    CAST(errors AS DOUBLE) / CAST(n AS DOUBLE) AS p,
    CAST(n AS DOUBLE) AS nd
  FROM a
)
SELECT endpoint, n, errors, ROUND(p, 6) AS rate,
  ROUND(GREATEST(CAST(0.0 AS DOUBLE),
    ((p + {_WZ2!r} / (2.0 * nd))
     - {_WZ!r} * sqrt((p * (1.0 - p) / nd) + {_WZ2!r} / ((4.0 * nd) * nd)))
    / (1.0 + {_WZ2!r} / nd)), 6) AS wilson_low,
  ROUND(LEAST(CAST(1.0 AS DOUBLE),
    ((p + {_WZ2!r} / (2.0 * nd))
     + {_WZ!r} * sqrt((p * (1.0 - p) / nd) + {_WZ2!r} / ((4.0 * nd) * nd)))
    / (1.0 + {_WZ2!r} / nd)), 6) AS wilson_high
FROM c
"""

_SLO_BUDGET = 1.0 - 0.99  # replayed exactly: repr of the Python double

_ORACLE["slo_burn_alerts"] = f"""
WITH m AS (
  SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 21600) * 21600 AS bucket_epoch,
    CASE WHEN event_id % 4 = 3 THEN 1 ELSE 0 END AS err
  FROM events WHERE event_id % 10 <> 0
), fast AS (
  SELECT bucket_epoch, COUNT(*) AS n, SUM(err) AS errors
  FROM m GROUP BY bucket_epoch
), slow AS (
  SELECT (bucket_epoch // 86400) * 86400 AS sb, SUM(n) AS sn, SUM(errors) AS se
  FROM fast GROUP BY 1
), j AS (
  SELECT f.bucket_epoch, f.n, f.errors,
    (CAST(f.errors AS DOUBLE) / CAST(f.n AS DOUBLE)) / {_SLO_BUDGET!r} AS fb,
    (CAST(s.se AS DOUBLE) / CAST(s.sn AS DOUBLE)) / {_SLO_BUDGET!r} AS sb2
  FROM fast f JOIN slow s ON (f.bucket_epoch // 86400) * 86400 = s.sb
)
SELECT bucket_epoch, CAST(n AS BIGINT) AS n, CAST(errors AS BIGINT) AS errors,
  ROUND(fb, 6) AS fast_burn, ROUND(sb2, 6) AS slow_burn,
  (fb > 2.0 AND sb2 > 1.0) AS alert
FROM j
"""

_ORACLE["cache_hit_report"] = """
WITH m AS (
  SELECT concat('d', CAST(event_id % 5 AS VARCHAR), '.cloudfront.net') AS cs_host,
    CASE WHEN event_id % 4 IN (0, 2) THEN 1 ELSE 0 END AS cached,
    CAST(FLOOR(value * 100) AS BIGINT) AS b
  FROM events WHERE event_id % 10 <> 0
)
SELECT cs_host, CAST(COUNT(*) AS BIGINT) AS requests,
  CAST(SUM(cached) AS BIGINT) AS hits,
  ROUND(CAST(SUM(cached) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS hit_ratio,
  CAST(SUM(b) AS BIGINT) AS bytes_total,
  CAST(SUM(CASE WHEN cached = 1 THEN b ELSE 0 END) AS BIGINT) AS bytes_from_cache
FROM m GROUP BY cs_host
"""

_ORACLE["session_transitions"] = """
WITH t AS (
  SELECT user_id, event_type AS page,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev_page
  FROM events
)
SELECT prev_page, page, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM t WHERE prev_page IS NOT NULL GROUP BY prev_page, page
"""

_ORACLE["gap_downtime"] = """
WITH s AS (
  SELECT concat('src', CAST(event_id % 20 AS VARCHAR)) AS source, ts FROM events
), t AS (
  SELECT source, ts, lag(ts) OVER (PARTITION BY source ORDER BY ts) AS prev
  FROM s
)
SELECT source, prev AS gap_start, ts AS gap_end,
  CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(prev)) AS BIGINT) AS gap_s
FROM t
WHERE prev IS NOT NULL
  AND CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(prev)) AS BIGINT) >= 1800
"""

_ORACLE["retention_cohorts"] = """
WITH a AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day FROM events
), c AS (
  SELECT u, MIN(day) AS cohort_day FROM a GROUP BY u
)
SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN c USING (u) GROUP BY cohort_day, day_offset
"""


def _rendezvous_oracle(n: int = 8) -> str:
    """Unrolled HRW argmax: first index whose digest equals the
    GREATEST digest — the same first-occurrence tiebreak as Spark's
    array_position."""
    hs = [f"md5(concat(CAST(doc_id AS VARCHAR), ':{s}'))" for s in range(n)]

    def argmax(k: int) -> str:
        g = "GREATEST(" + ", ".join(hs[:k]) + ")"
        cases = " ".join(f"WHEN {hs[s]} = {g} THEN {s}" for s in range(k))
        return f"(CASE {cases} END)"

    return f"""
WITH a AS (
  SELECT {argmax(n)} AS shard,
    CASE WHEN {argmax(n)} <> {argmax(n - 1)} THEN 1 ELSE 0 END AS moved
  FROM documents
)
SELECT CAST(shard AS INT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(moved) AS BIGINT) AS n_moved_on_remove_last
FROM a GROUP BY shard
"""


_ORACLE["rendezvous_shards"] = _rendezvous_oracle(8)

_ORACLE["cms_accuracy"] = r"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
), exact AS (
  SELECT tok AS item, CAST(COUNT(*) AS BIGINT) AS exact FROM toks GROUP BY tok
), rs AS (
  SELECT UNNEST([0, 1, 2, 3]) AS r
), occ AS (
  SELECT rs.r,
    CAST('0x' || substr(md5(concat(CAST(rs.r AS VARCHAR), ':', tok)), 1, 8)
         AS BIGINT) % 32 AS bucket
  FROM toks CROSS JOIN rs
), grid AS (
  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM occ GROUP BY r, bucket
), probe AS (
  SELECT e.item, e.exact, rs.r,
    CAST('0x' || substr(md5(concat(CAST(rs.r AS VARCHAR), ':', e.item)), 1, 8)
         AS BIGINT) % 32 AS b
  FROM exact e CROSS JOIN rs
)
SELECT p.item, p.exact, MIN(g.cnt) AS est, MIN(g.cnt) - p.exact AS overshoot
FROM probe p JOIN grid g ON g.r = p.r AND g.bucket = p.b
GROUP BY p.item, p.exact
"""

# the HLL bias numerator alpha_256 * m^2 * 2^SCALE is computed ONCE here
# (exactly the Python expression sketches.hll_estimate embeds as its lit)
# and inlined via repr() so both engines divide by the identical double
_HLL_NUM = 0.7213 / (1 + 1.079 / 256) * 256 * 256 * float(2**53)

_ORACLE["hll_distinct"] = f"""
WITH h AS (
  SELECT event_type,
    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events WHERE event_id IS NOT NULL
), r AS (
  SELECT event_type, hv % 256 AS bucket,
    CASE WHEN (hv >> 8) > 0 THEN 53 - length(bin(hv >> 8)) ELSE 53 END AS rho
  FROM h
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS rho FROM r GROUP BY 1, 2
), agg AS (
  SELECT event_type, COUNT(*) AS filled,
    SUM(1::BIGINT << (53 - rho)) AS zint
  FROM regs GROUP BY 1
), e AS (
  SELECT event_type, (256 - filled) AS v,
    {_HLL_NUM!r} / ((((256 - filled)::BIGINT << 53) + zint)::DOUBLE) AS raw
  FROM agg
), est AS (
  SELECT event_type,
    ROUND(CASE WHEN raw <= 640.0 AND v > 0
               THEN 256.0 * ln(256.0 / v) ELSE raw END, 4) AS est
  FROM e
), x AS (
  SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_n
  FROM events WHERE event_id IS NOT NULL GROUP BY 1
)
SELECT x.event_type, x.exact_n, est.est,
       ROUND(ABS(est.est - x.exact_n) / x.exact_n, 4) AS rel_err
FROM est JOIN x USING (event_type)
"""

_ORACLE["utm_attribution"] = """
WITH m AS (
  SELECT
    CASE WHEN event_id % 3 = 1 THEN concat('src ', CAST(user_id % 3 AS VARCHAR))
         ELSE concat('s', CAST(user_id % 3 AS VARCHAR)) END AS utm_source,
    CASE WHEN event_id % 3 = 1 THEN
      (CASE WHEN event_id % 2 = 0 THEN 'email' ELSE 'cpc' END)
         ELSE '-' END AS utm_medium,
    CASE WHEN event_id % 3 = 1 THEN concat('c', CAST(event_id % 5 AS VARCHAR))
         ELSE '-' END AS utm_campaign
  FROM events WHERE event_id % 10 <> 0 AND event_id % 3 <> 0
)
SELECT utm_source, utm_medium, utm_campaign, CAST(COUNT(*) AS BIGINT) AS hits
FROM m GROUP BY utm_source, utm_medium, utm_campaign
"""

_ORACLE["readability_bands"] = r"""
WITH c AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                    x -> x <> '')) AS words,
    GREATEST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')), 1)
      AS sentences,
    len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) AS syllables
  FROM documents
), f AS (
  SELECT doc_id, words, sentences, syllables,
    206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
            - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)) AS raw
  FROM c WHERE words > 0
)
SELECT doc_id, CAST(words AS BIGINT) AS words,
  CAST(sentences AS BIGINT) AS sentences,
  CAST(syllables AS BIGINT) AS syllables,
  ROUND(raw, 6) AS flesch,
  CASE WHEN raw >= 60 THEN 'easy' WHEN raw >= 30 THEN 'standard'
       ELSE 'difficult' END AS band
FROM f
"""


# --- round-4c oracles --------------------------------------------------------

_ORACLE["ua_breakdown"] = (
    """
WITH map AS (
  SELECT * FROM (VALUES
"""
    + ",\n".join(
        f"    ({i}, '{fam}', '{os_}', "
        + ("NULL" if major is None else str(major)) + ")"
        for i, (fam, os_, major) in enumerate(_UA_EXPECT)
    )
    + """
  ) v(c, family, os, major)
), m AS (
  SELECT CAST(event_id % 8 AS INT) AS c FROM events WHERE event_id % 10 <> 0
)
SELECT map.family, map.os, CAST(map.major AS INT) AS major,
  CAST(COUNT(*) AS BIGINT) AS requests
FROM m JOIN map ON m.c = map.c
GROUP BY map.family, map.os, map.major
"""
)

_ORACLE["ip_anon_kcheck"] = """
WITH m AS (
  SELECT concat('10.', CAST(event_id % 3 AS VARCHAR), '.',
                CAST(event_id % 5 AS VARCHAR), '.0') AS prefix24,
    concat('10.', CAST(event_id % 3 AS VARCHAR), '.',
           CAST(event_id % 5 AS VARCHAR), '.',
           CAST(CASE WHEN event_id % 3 = 0 THEN event_id % 2
                     ELSE event_id % 40 END AS VARCHAR)) AS ip
  FROM events WHERE event_id % 10 <> 0
)
SELECT prefix24, CAST(COUNT(*) AS BIGINT) AS n_requests,
  CAST(COUNT(DISTINCT ip) AS BIGINT) AS k_distinct_ips,
  (COUNT(DISTINCT ip) >= 5) AS k_ok
FROM m GROUP BY prefix24
"""

_ORACLE["active_users_rolling"] = """
WITH a AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM a GROUP BY day
), fan AS (
  SELECT DISTINCT u, day + INTERVAL (i) DAY AS wd
  FROM a CROSS JOIN range(7) t(i)
), wau AS (
  SELECT wd, COUNT(*) AS wau FROM fan GROUP BY wd
)
SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
  ROUND(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau ON day = wd
"""

_ORACLE["last_touch"] = """
WITH t AS (
  SELECT user_id, ts, event_type,
    CASE WHEN event_id % 3 = 1
         THEN concat('c', CAST(event_id % 5 AS VARCHAR)) END AS camp
  FROM events
), w AS (
  SELECT event_type,
    coalesce(last_value(camp IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, camp NULLS FIRST
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), '-') AS campaign
  FROM t
)
SELECT campaign, CAST(COUNT(*) AS BIGINT) AS conversions
FROM w WHERE event_type = 'purchase' GROUP BY campaign
"""


def _kcore_oracle(k: int = 3, rounds: int = 3) -> str:
    """Unrolled peel: per round, degree count + both-endpoint semi-join
    against the surviving node set — the same rounds kcore_peel runs."""
    base = """
WITH kk AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS m,
    CAST((doc_id % 20) // 4 AS INT) AS k
  FROM documents WHERE doc_id < 400
), raw AS (
  SELECT
    CASE WHEN m = 0 THEN concat('h', CAST(k % 5 AS VARCHAR))
         WHEN m = 1 THEN concat('h', CAST(k % 5 AS VARCHAR))
         WHEN m = 2 THEN concat('f', CAST(k % 5 AS VARCHAR))
         WHEN doc_id % 8 = 3 THEN concat('f', CAST(k % 5 AS VARCHAR))
         ELSE concat('l', CAST(k % 5 AS VARCHAR)) END AS src,
    CASE WHEN m = 0 THEN concat('h', CAST((k + 1) % 5 AS VARCHAR))
         WHEN m = 1 THEN concat('h', CAST((k + 2) % 5 AS VARCHAR))
         WHEN m = 2 THEN concat('h', CAST(k % 5 AS VARCHAR))
         WHEN doc_id % 8 = 3 THEN concat('h', CAST((k + 1) % 5 AS VARCHAR))
         ELSE concat('f', CAST(k % 5 AS VARCHAR)) END AS dst
  FROM kk
), e0 AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM raw
    UNION ALL SELECT dst AS a, src AS b FROM raw
  ) WHERE a <> b
)"""
    parts = [base]
    for r in range(rounds):
        parts.append(f""",
d{r} AS (SELECT a, COUNT(*) AS deg FROM e{r} GROUP BY a),
k{r} AS (SELECT a FROM d{r} WHERE deg >= {k}),
e{r + 1} AS (
  SELECT e.a, e.b FROM e{r} e
  WHERE EXISTS (SELECT 1 FROM k{r} x WHERE x.a = e.a)
    AND EXISTS (SELECT 1 FROM k{r} y WHERE y.a = e.b)
)""")
    parts.append(f"""
SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY a
""")
    return "".join(parts)


_ORACLE["kcore_hosts"] = _kcore_oracle(3, 3)

_ORACLE["latency_regression"] = f"""
WITH m AS (
  SELECT {_ELB_SQL} AS elb, {_LAT_SQL} AS lat,
    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'before'
         ELSE 'after' END AS period
  FROM events WHERE event_id % 10 <> 0
), a AS (
  SELECT elb, period, quantile_cont(lat, 0.95) AS pq, COUNT(*) AS n
  FROM m GROUP BY elb, period
)
SELECT b.elb, ROUND(b.pq, 6) AS p_before, ROUND(f.pq, 6) AS p_after,
  ROUND(f.pq - b.pq, 6) AS delta,
  CAST(b.n AS BIGINT) AS n_before, CAST(f.n AS BIGINT) AS n_after,
  ((f.pq - b.pq) > 0.05) AS regressed
FROM a b JOIN a f ON b.elb = f.elb
WHERE b.period = 'before' AND f.period = 'after'
"""


def oracle_sql() -> dict[str, str]:
    """Every queries() entry has an oracle row (CLAUDE.md invariant):
    ann_lsh's oracle reproduces the deterministic bucketing + re-rank in
    DuckDB, and stream_windowed_counts' oracle is the closed-form
    expectation of the synthesized stream."""
    return dict(_ORACLE)
