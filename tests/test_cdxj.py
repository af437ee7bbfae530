"""CDXJ index scan (sources/cdxj.py) and SURT key (webtext.surt_key).

CDXJ is the public line format of Common Crawl's URL index / pywb
(``<SURT> <ts14> <JSON>``); SURT is its canonical URL key. The parse
follows the reference's unmatched-line discipline (parser_regex.go's
first-match decode): malformed lines are surfaced with valid=false and
the raw line retained, never silently dropped.
"""

from __future__ import annotations

import gzip

from pyspark.sql import Row
from pyspark.sql import functions as F

from access_log_parser_spark.operators.webtext import surt_key
from access_log_parser_spark.sources.cdxj import parse_cdxj_lines, read_cdxj

GOOD = (
    'com,example)/p/1 20240115103000 {"url": "https://example.com/p/1", '
    '"mime": "text/html", "status": 200, "digest": "sha1:AB", '
    '"length": "1234", "offset": "5678", "filename": "c-00.warc.gz"}'
)


def _parse(spark, *lines):
    df = spark.createDataFrame([Row(line=ln) for ln in lines])
    return {r["raw"]: r.asDict() for r in parse_cdxj_lines(df).collect()}


def test_cdxj_valid_line_all_fields(spark):
    got = _parse(spark, GOOD)[GOOD]
    assert got["valid"] is True
    assert got["surt"] == "com,example)/p/1"
    assert got["ts"].strftime("%Y%m%d%H%M%S") == "20240115103000"
    assert got["url"] == "https://example.com/p/1"
    assert got["mime"] == "text/html"
    assert got["status"] == 200
    assert got["digest"] == "sha1:AB"
    # pywb writes length/offset as JSON strings — must cast to long
    assert got["length"] == 1234 and got["offset"] == 5678
    assert got["filename"] == "c-00.warc.gz"


def test_cdxj_malformed_lines_fail_visible_not_dropped(spark):
    bad_ts = 'com,example)/x 2024 {"url": "https://example.com/x"}'
    no_url = 'com,example)/y 20240101000000 {"mime": "text/html"}'
    junk = "not an index line"
    got = _parse(spark, GOOD, bad_ts, no_url, junk)
    assert len(got) == 4  # nothing dropped
    for raw in (bad_ts, no_url, junk):
        row = got[raw]
        assert row["valid"] is False
        assert all(
            row[c] is None
            for c in ("surt", "ts", "url", "mime", "status", "digest",
                      "length", "offset", "filename")
        )
    # counters invariant derivable: total = valid + invalid
    assert sum(1 for r in got.values() if r["valid"]) == 1


def test_cdxj_missing_optional_json_fields_stay_null(spark):
    ln = 'org,ex)/a 20240101000000 {"url": "https://ex.org/a"}'
    got = _parse(spark, ln)[ln]
    assert got["valid"] is True and got["url"] == "https://ex.org/a"
    assert got["mime"] is None and got["length"] is None


def test_read_cdxj_plain_and_gzip(spark, tmp_path):
    (tmp_path / "idx.cdxj").write_text(GOOD + "\nbroken\n")
    with gzip.open(tmp_path / "idx2.cdxj.gz", "wt") as f:
        f.write(GOOD + "\n")
    out = read_cdxj(spark, str(tmp_path / "idx*")).collect()
    assert len(out) == 3
    assert sum(1 for r in out if r["valid"]) == 2


# ----------------------------------------------------------- surt_key
def _surt(spark, *urls):
    df = spark.createDataFrame([Row(url=u) for u in urls])
    return {
        r["url"]: r["k"]
        for r in df.select("url", surt_key(F.col("url")).alias("k")).collect()
    }


def test_surt_case_www_port_query_fragment(spark):
    got = _surt(
        spark,
        "HTTPS://WWW.Example.COM:443/a/B?b=2&a=1#frag",
        "http://example.com/a/B?a=1&b=2",
    )
    # case-folded host (path case kept), www dropped, :443 dropped,
    # query byte-sorted, fragment gone
    assert got["HTTPS://WWW.Example.COM:443/a/B?b=2&a=1#frag"] == (
        "com,example)/a/B?a=1&b=2"
    )
    # equivalent URLs collide on the key
    assert len(set(got.values())) == 1


def test_surt_nondefault_port_and_label_reversal(spark):
    got = _surt(spark, "http://a.b.example.org:8080//x//y/")
    assert got["http://a.b.example.org:8080//x//y/"] == (
        "org,example,b,a:8080)/x/y"
    )


def test_surt_bare_root_and_no_path(spark):
    got = _surt(spark, "https://example.net/", "https://example.net")
    assert set(got.values()) == {"net,example)/"}


def test_surt_hierarchical_host_locality(spark):
    """SURT keys of one site sort contiguously — the property the
    range-partitioned index layout relies on (docstring claim)."""
    got = _surt(
        spark,
        "https://a.example.com/1",
        "https://b.example.com/2",
        "https://example.com/3",
        "https://examplf.com/0",
    )
    keys = sorted(got.values())
    ex = [k for k in keys if k.startswith("com,example")]
    i = keys.index(ex[0])
    assert keys[i : i + len(ex)] == ex  # contiguous run
