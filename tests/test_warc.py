"""WARC record scan: byte-accurate Content-Length framing vs a Python
builder, including payloads that contain 'WARC/1.0' and torn tails."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row

from access_log_parser_spark.sources.warc import (
    iter_warc_records,
    parse_warc_records,
)


def _record(uri: str, body: bytes, wtype: str = "response",
            status: int = 200) -> bytes:
    http = (f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n"
            .encode() + body)
    block = http if wtype == "response" else body
    head = (f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(block)}\r\n\r\n").encode()
    return head + block + b"\r\n\r\n"


def test_iter_warc_records_framing_resists_embedded_magic():
    tricky = b"<html>WARC/1.0 appears IN the body\r\n\r\n</html>"
    data = (_record("https://a.example/1", b"<html>one</html>")
            + _record("https://a.example/2", tricky)
            + _record("meta:3", b"not http", wtype="metadata"))
    recs = list(iter_warc_records(data))
    assert len(recs) == 3
    assert recs[1][1].endswith(tricky)  # block carries the tricky body
    assert recs[2][0]["warc-type"] == "metadata"


def test_iter_warc_records_stops_at_torn_tail():
    good = _record("https://a.example/1", b"<html>ok</html>")
    torn = good + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    recs = list(iter_warc_records(torn))
    assert len(recs) == 1  # torn record dropped, earlier ones intact


def test_scan_warc_records_reports_truncation():
    from access_log_parser_spark.sources.warc import scan_warc_records

    good = _record("https://a.example/1", b"<html>ok</html>")
    recs, truncated = scan_warc_records(good)
    assert len(recs) == 1 and truncated is False
    # torn tail after a good record: records intact, flag raised
    recs, truncated = scan_warc_records(
        good + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    )
    assert len(recs) == 1 and truncated is True
    # non-numeric Content-Length and trailing garbage both flag
    assert scan_warc_records(
        good + b"WARC/1.0\r\nContent-Length: x\r\n\r\n"
    )[1] is True
    assert scan_warc_records(good + b"garbage")[1] is True
    assert scan_warc_records(b"")[1] is False


def test_parse_warc_records_truncated_column(spark):
    good = _record("https://a.example/1", b"<html>one</html>")
    files = [
        Row(path="clean.warc", content=good + _record(
            "meta:x", b"rawblock", wtype="metadata")),
        Row(path="torn.warc",
            content=good + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nsh"),
    ]
    out = parse_warc_records(spark.createDataFrame(files)).collect()
    flags = {}
    for r in out:
        flags.setdefault(r["source"], set()).add(r["truncated"])
    # constant per file: every clean.warc row False, every torn.warc True
    assert flags == {"clean.warc": {False}, "torn.warc": {True}}


def test_parse_warc_records_end_to_end(spark):
    files = [
        Row(path="f1.warc",
            content=_record("https://a.example/1", b"<html>one</html>")
            + _record("https://a.example/2", b"<html>two</html>", status=404)),
        Row(path="f2.warc",
            content=_record("meta:x", b"rawblock", wtype="metadata")),
        Row(path="f3.warc", content=b"not a warc at all"),
    ]
    out = parse_warc_records(spark.createDataFrame(files)).collect()
    by = {(r["source"], r["record_idx"]): r for r in out}
    assert len(by) == 3
    assert by[("f1.warc", 0)]["target_uri"] == "https://a.example/1"
    assert bytes(by[("f1.warc", 0)]["html"]) == b"<html>one</html>"
    assert by[("f1.warc", 1)]["http_status"] == 404
    assert by[("f2.warc", 0)]["warc_type"] == "metadata"
    assert by[("f2.warc", 0)]["http_status"] is None
    assert bytes(by[("f2.warc", 0)]["html"]) == b"rawblock"
    assert ("f3.warc", 0) not in by  # malformed file yields no rows


def test_wet_records_filters_to_conversion_and_decodes(spark):
    from access_log_parser_spark.sources.warc import wet_records

    files = [
        Row(path="f.wet",
            content=_record("https://a.example/1", b"GET /", wtype="request")
            + _record("https://a.example/1", "extracted text é".encode(),
                      wtype="conversion")),
    ]
    out = wet_records(spark.createDataFrame(files)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["record_idx"] == 1 and r["text"] == "extracted text é"
    assert r["target_uri"] == "https://a.example/1"
    assert r["truncated"] is False


def test_wat_records_payload_json_stays_columnar(spark):
    from pyspark.sql import functions as F

    from access_log_parser_spark.sources.warc import wat_records

    payload = (b'{"Envelope":{"Payload-Metadata":'
               b'{"Actual-Content-Length":42}}}')
    files = [Row(path="f.wat",
                 content=_record("https://a.example/1", payload,
                                 wtype="metadata"))]
    out = wat_records(spark.createDataFrame(files))
    got = out.select(
        F.get_json_object(
            "payload_json",
            "$.Envelope['Payload-Metadata']['Actual-Content-Length']",
        ).cast("bigint").alias("n")
    ).collect()
    assert got[0]["n"] == 42


def test_read_wet_binaryfile_roundtrip(spark, tmp_path):
    from access_log_parser_spark.sources.warc import read_wet

    p = tmp_path / "seg.warc.wet"
    p.write_bytes(_record("https://b.example/x", b"plain text",
                          wtype="conversion"))
    out = read_wet(spark, str(p)).collect()
    assert len(out) == 1 and out[0]["text"] == "plain text"


def test_read_warc_binaryfile_roundtrip(spark, tmp_path):
    from access_log_parser_spark.sources.warc import read_warc

    p = tmp_path / "seg.warc"
    p.write_bytes(_record("https://b.example/x", b"<html>disk</html>"))
    out = read_warc(spark, str(p)).collect()
    assert len(out) == 1 and out[0]["target_uri"] == "https://b.example/x"
    assert bytes(out[0]["html"]) == b"<html>disk</html>"
