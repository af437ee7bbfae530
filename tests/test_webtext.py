"""Web-text curation operators (operators/webtext.py): PII scrubbing,
Gopher repetition signals, corpus-wide paragraph dedup, URL blocklist
filtering, benchmark decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators import webtext


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at john.doe+x@example.co.uk or call +4915112345678"),
            (1, "server 10.0.255.3 and 192.168.1.1 are down"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in webtext.pii_redact(df).collect()}
    assert out[0]["clean_text"] == "mail me at <EMAIL> or call <PHONE>"
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ips"]) == (1, 1, 0)
    assert out[1]["clean_text"] == "server <IP> and <IP> are down"
    assert out[1]["n_ips"] == 2
    assert out[2]["clean_text"] == "nothing sensitive here"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (0, "a a b"),
            (1, "x y z w"),                  # no repetition at all
            (2, "spam spam spam spam"),      # total repetition
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in webtext.repetition_signals(df).collect()}
    r0 = out[0]
    assert r0["n_tokens"] == 3
    assert r0["dup_word_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert r0["dup_2gram_frac"] == 0.0        # "a a", "a b" distinct
    assert r0["top_word_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_word_frac"] == 0.25
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.75
    assert r2["dup_2gram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert r2["top_word_frac"] == 1.0


def test_repetition_signals_short_doc_no_grams(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    r = webtext.repetition_signals(df).collect()[0]
    assert r["n_tokens"] == 1
    assert r["dup_2gram_frac"] == 0.0 and r["dup_3gram_frac"] == 0.0
    assert r["top_word_frac"] == 1.0


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha\nbeta\ngamma"),
            (1, "beta\ndelta"),        # beta already seen in doc 0
            (2, "alpha\nbeta"),        # entirely duplicates -> empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in webtext.paragraph_dedup(df).collect()}
    assert out[0] == "alpha\nbeta\ngamma"
    assert out[1] == "delta"
    assert out[2] == ""


def test_paragraph_dedup_keeps_null_text_docs(spark):
    # split(NULL) -> NULL and posexplode over NULL emits no rows, so a
    # null-text doc would silently vanish from the regroup without the
    # coalesce guard; the "keeps every doc" contract says it comes back
    # with empty text like any all-duplicate doc.
    df = spark.createDataFrame(
        [(0, "alpha\nbeta"), (1, None), (2, "beta\ngamma")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in webtext.paragraph_dedup(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0] == "alpha\nbeta"
    assert out[1] == ""
    assert out[2] == "gamma"


def test_paragraph_dedup_keeps_within_doc_order(spark):
    df = spark.createDataFrame(
        [(0, "z\na\nm"), (1, "q\nz\nb")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in webtext.paragraph_dedup(df).collect()}
    assert out[0] == "z\na\nm"      # original order, NOT sorted by text
    assert out[1] == "q\nb"


def test_host_suffix_filter(spark):
    df = spark.createDataFrame(
        [
            (0, "https://ads.tracker.com/x"),
            (1, "https://tracker.com/y"),
            (2, "https://nottracker.com/z"),   # suffix match is label-wise
            (3, "http://sub.good.org/a"),
            (4, "https://evil.example.net/b"),
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame(
        [("tracker.com",), ("evil.example.net",)], ["domain"]
    )
    kept = sorted(
        r["doc_id"] for r in webtext.host_suffix_filter(df, blocked).collect()
    )
    assert kept == [2, 3]
    # and the plan is an equi-join, not a nested loop
    plan = (
        webtext.host_suffix_filter(df, blocked)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_contamination_flags(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "he said the quick brown fox jumps far away"),  # shares grams
            (1, "completely unrelated text about spark plans"),
            (2, "the quick brown fox jumps over the lazy dog indeed"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in webtext.contamination_flags(corpus, bench, n=5).collect()
    }
    assert 1 not in out              # clean doc absent from the flag table
    assert out[0] == 1               # "the quick brown fox jumps"
    assert out[2] == 5               # all five 5-grams of the benchmark line


def test_normalize_url(spark):
    cases = [
        ("HTTPS://Example.COM:443/a//b///c/", "https://example.com/a/b/c"),
        ("http://Host.org:80/", "http://host.org/"),
        ("http://host.org:8080/x#frag", "http://host.org:8080/x"),
        ("https://a.b/", "https://a.b/"),
        ("https://a.b", "https://a.b"),
        ("https://a.b/path/", "https://a.b/path"),
        ("ftp://Weird.Host:80/x", "ftp://weird.host:80/x"),  # non-http keeps port
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "doc_id long, url string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", webtext.normalize_url(F.col("url")).alias("n")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_url_dedup_first(spark):
    df = spark.createDataFrame(
        [
            (1, "https://Example.com:443/x/"),
            (2, "https://example.com/x"),      # same after normalization
            (3, "https://example.com/y"),
        ],
        "doc_id long, url string",
    )
    kept = {r["doc_id"]: r["norm_url"] for r in webtext.url_dedup_first(df).collect()}
    assert set(kept) == {1, 3}
    assert kept[1] == "https://example.com/x"


def test_repetition_signals_max_tokens_cap(spark):
    """The per-row cost cap: only the first max_tokens tokens are scored
    (and n_tokens reflects the truncation)."""
    df = spark.createDataFrame([(0, "a a a b c d e f")], "doc_id long, text string")
    r = webtext.repetition_signals(df, max_tokens=3).collect()[0]
    assert r["n_tokens"] == 3          # "a a a"
    assert r["dup_word_frac"] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert r["top_word_frac"] == 1.0
    full = webtext.repetition_signals(df).collect()[0]
    assert full["n_tokens"] == 8


def test_normalize_url_idempotent(spark):
    """Canonicalizers must be fixed points: normalize(normalize(u)) ==
    normalize(u) over a seeded zoo of URL-ish strings (ports, doubled
    slashes, fragments, mixed case, empty paths, junk)."""
    import random

    rng = random.Random(20260817)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "a.b", "X.Y.Z", "host-1.org"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "//", "/a//b/", "/a/b#f", "/p/q/", "///x", "/#only-frag"]
    urls = [
        f"{rng.choice(schemes)}://{rng.choice(hosts)}{rng.choice(ports)}{rng.choice(paths)}"
        for _ in range(300)
    ] + ["not a url at all", "", "https://", "http://:80/"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, u string")
    once = webtext.normalize_url(F.col("u"))
    twice = webtext.normalize_url(once)
    bad = df.select("u", once.alias("n1"), twice.alias("n2")).filter(
        F.col("n1") != F.col("n2")
    ).collect()
    assert bad == [], [(r["u"], r["n1"], r["n2"]) for r in bad[:5]]


def test_c4_line_filter(spark):
    df = spark.createDataFrame(
        [
            (0, "This is a sentence.\nshort\nAnother good one!\nno terminal punct"),
            (1, "only junk\nmore junk"),
            (2, 'He said "stop".\nIs that a question?\nThe quoted end."\nA question?'),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in webtext.c4_line_filter(df).collect()}
    assert out[0]["text"] == "This is a sentence.\nAnother good one!"
    assert (out[0]["n_lines_kept"], out[0]["n_lines_dropped"]) == (2, 2)
    assert 1 not in out                     # whole doc dropped
    # ., ? and " all count as terminal; "A question?" has only 2 words
    assert out[2]["n_lines_kept"] == 3 and out[2]["n_lines_dropped"] == 1


def test_gopher_quality(spark):
    long_good = "the quick of " + " ".join(["word"] * 56) + "."
    df = spark.createDataFrame(
        [
            (0, long_good),                               # passes everything
            (1, "too few words here"),                    # n_words gate
            (2, " ".join(["word"] * 60) + " ###### ##"),  # symbol ratio
            (3, "\n".join(["- bullet item"] * 10)),       # bullets + few words
            (4, " ".join(["12345"] * 60)),                # alpha_word_frac = 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in webtext.gopher_quality(df).collect()}
    assert out[0]["passes"] is True
    assert out[0]["n_words"] == 59
    assert out[0]["stopword_hits"] == 2
    assert out[1]["passes"] is False and out[1]["n_words"] == 4
    assert out[2]["passes"] is False and out[2]["symbol_word_ratio"] > 0.1
    assert out[3]["passes"] is False and out[3]["bullet_line_frac"] == 1.0
    assert out[4]["passes"] is False and out[4]["alpha_word_frac"] == 0.0
    # the symbol-spam doc also trips the stopword rule now
    assert out[2]["stopword_hits"] == 0


def test_html_to_text(spark):
    html = (
        "<html><head><script>var x = '<p>';</script><style>a{color:red}</style>"
        "</head><body><h1>Title!</h1>\n<p>Tom &amp; Jerry say &quot;hi&quot;"
        " &lt;now&gt;.</p></body></html>"
    )
    df = spark.createDataFrame(
        [(0, bytearray(html.encode()))], "doc_id long, html binary"
    )
    r = webtext.html_to_text(df).collect()[0]
    assert r["text"] == 'Title! Tom & Jerry say "hi" <now>.'
