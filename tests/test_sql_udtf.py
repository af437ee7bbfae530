"""SQL-surface UDTF (functions/sql_udtf.py): LATERAL parse over a table
must match the engine's extract_fields on the same lines."""

from __future__ import annotations

from access_log_parser_spark import extract_fields
from access_log_parser_spark.functions.sql_udtf import register_parse_udtf

LINES = [
    (1, '1.2.3.4 - u [12/Mar/2023:10:55:36 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua1"'),
    (2, "GARBAGE"),
    (3, '5.6.7.8 - v [12/Mar/2023:10:55:37 +0000] "POST /b HTTP/1.1" 404 20 "-" "ua2"'),
    (4, '9.9.9.9 - w [12/Mar/2023:10:55:38 +0000] "GET /c HTTP/1.1" 200 5'),  # pattern 1
]


def test_udtf_matches_engine(spark):
    register_parse_udtf(spark, "parse_clf_t", "apache_clf",
                        fields=["remote_host", "status", "referer"])
    df = spark.createDataFrame(LINES, ["id", "line"])
    df.createOrReplaceTempView("udtf_lines")
    sql_rows = {
        r["id"]: (r["pattern_id"], r["remote_host"], r["status"], r["referer"])
        for r in spark.sql(
            "SELECT l.id, t.* FROM udtf_lines l, LATERAL parse_clf_t(l.line) t"
        ).collect()
    }
    eng = {
        r["id"]: (r["pattern_id"], r["remote_host"], r["status"], r["referer"])
        for r in extract_fields(
            df, "apache_clf", passthrough=["id"], line_col="line",
        ).select("id", "pattern_id", "remote_host", "status", "referer").collect()
    }
    assert sql_rows == eng
    assert sql_rows[2][0] == -1                    # unmatched
    assert sql_rows[4][0] == 1                     # fallback pattern wins
    assert sql_rows[4][3] is None                  # referer absent in pattern 1


def test_ltsv_udtf(spark):
    from access_log_parser_spark.functions.sql_udtf import register_ltsv_udtf

    register_ltsv_udtf(spark, "parse_ltsv_t")
    rows = spark.sql(
        "SELECT t.* FROM VALUES ('a:1\tb:2'), ('bad field') AS v(l), "
        "LATERAL parse_ltsv_t(v.l) t ORDER BY t.pos"
    ).collect()
    assert [(r["pos"], r["label"], r["value"]) for r in rows] == [
        (-1, None, None), (0, "a", "1"), (1, "b", "2"),
    ]
