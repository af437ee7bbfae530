"""Seeded randomized equivalence sweep: random Option combinations over a
mixed matched/unmatched corpus must produce identical routed rows on the
compat, fast(python) and fast(jvm) engines."""

import random

import golden_s3 as g
from access_log_parser_spark import Option
from access_log_parser_spark.engine import fast_parse_routed, parse_routed
from access_log_parser_spark.sources import lines_from_string

HANDLERS = ["json", "kv", "ltsv", "tsv", "pretty_json"]
LABEL_POOL = ["bucket", "method", "http_status", "bytes_sent", "tls_version"]
FILTER_POOL = [
    "http_status == 200",
    "http_status != 404",
    "bucket =~ rand",
    "bucket ==* AWSRANDOMBUCKET43",
    "bytes_sent >= 113",
    "bytes_sent < 250",
]


def rand_option(rng: random.Random) -> Option:
    return Option(
        labels=tuple(rng.sample(LABEL_POOL, rng.randint(0, 3))),
        filters=tuple(rng.sample(FILTER_POOL, rng.randint(0, 2))),
        skip_lines=tuple(sorted(rng.sample(range(1, 11), rng.randint(0, 3)))),
        prefix=rng.random() < 0.3,
        unmatch_lines=rng.random() < 0.3,
        line_number=rng.random() < 0.5,
        line_handler=rng.choice(HANDLERS),
    )


def rows(routed):
    return sorted(
        (r["source"], r["line_no"], r["status"], r["pattern_id"], r["out_line"], r["raw"])
        for r in routed.collect()
    )


def test_randomized_equivalence(spark):
    rng = random.Random(42)
    corpus = "\n".join(
        [g.L1, g.L4_TRUNC, g.L2, g.L3, "garbage", g.L4_FULL, g.L5,
         g.AU2, g.L1, g.L5]
    )
    lines = lines_from_string(spark, corpus)
    for trial in range(8):
        opt = rand_option(rng)
        # numeric filters abort on '-' values in the compat path; the pool
        # avoids fields that are '-' in this corpus (bytes_sent is numeric
        # on every matched line)
        base = rows(parse_routed(lines, "s3", opt))
        assert rows(fast_parse_routed(lines, "s3", opt)) == base, (trial, opt)
        assert rows(fast_parse_routed(lines, "s3", opt, decoder="jvm")) == base, (
            trial,
            opt,
        )
