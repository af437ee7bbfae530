"""Round-3 third-wave operators: DSIR importance resampling, deterministic
epoch shuffle, quality-aware exact-dup resolution, soft URL-spam scoring,
per-doc token entropy.

Each test checks semantics against a hand-computable or brute-force
reference; the cross-engine value checks live in the driver oracle
queries (__spark_entry__.py)."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from access_log_parser_spark.operators.dedup import keep_best_duplicate
from access_log_parser_spark.operators.sampling import (
    dsir_logweights,
    dsir_select,
    epoch_shuffle,
)
from access_log_parser_spark.operators.text_quality import token_entropy
from access_log_parser_spark.operators.webtext import url_spam_score


def _bucket(tok: str, buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets


def _dsir_brute(raw: dict[int, str], target: list[str], buckets: int,
                smooth: float = 1.0) -> dict[int, float]:
    """Python replay of the hashed-unigram importance weights."""
    raw_c: Counter = Counter()
    for text in raw.values():
        raw_c.update(_bucket(t, buckets) for t in text.split())
    tgt_c: Counter = Counter()
    for text in target:
        tgt_c.update(_bucket(t, buckets) for t in text.split())
    tr, tt = sum(raw_c.values()), sum(tgt_c.values())

    def lam(b: int) -> float:
        lp_t = math.log((tgt_c.get(b, 0) + smooth) / (tt + smooth * buckets))
        lp_r = math.log((raw_c.get(b, 0) + smooth) / (tr + smooth * buckets))
        return lp_t - lp_r

    return {
        d: round(sum(lam(_bucket(t, buckets)) for t in text.split()), 4)
        for d, text in raw.items()
    }


# ------------------------------------------------------------------- DSIR
def test_dsir_logweights_match_brute_force(spark):
    raw = {
        0: "the cat sat on the mat",
        1: "quantum flux capacitors reticulate splines",
        2: "the dog sat on the log",
        3: "cat mat the the",
    }
    target = ["the cat likes the mat", "a cat on a mat"]
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in raw.items()])
    tgt = spark.createDataFrame([Row(doc_id=i, text=t)
                                 for i, t in enumerate(target)])
    got = {r["doc_id"]: r["logweight"]
           for r in dsir_logweights(df, tgt, buckets=64).collect()}
    want = _dsir_brute(raw, target, 64)
    assert got.keys() == want.keys()
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_dsir_select_prefers_target_like_docs(spark):
    # target-vocabulary docs must outrank the off-vocabulary one
    raw = {
        0: "alpha beta gamma alpha beta",
        1: "zzz qqq xxx www vvv",
        2: "alpha beta alpha beta gamma",
    }
    target = ["alpha beta gamma", "beta gamma alpha"]
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in raw.items()])
    tgt = spark.createDataFrame([Row(doc_id=i, text=t)
                                 for i, t in enumerate(target)])
    top = [r["doc_id"] for r in dsir_select(df, tgt, 2, buckets=64).collect()]
    assert set(top) == {0, 2}


# ---------------------------------------------------------- epoch shuffle
def test_epoch_shuffle_matches_md5_order_and_varies_by_epoch(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(40)])
    got1 = {r["doc_id"]: r["position"]
            for r in epoch_shuffle(df, epoch=1).collect()}
    order = sorted(
        range(40),
        key=lambda i: (hashlib.md5(f"1:{i}".encode()).hexdigest(), i),
    )
    want = {d: p + 1 for p, d in enumerate(order)}
    assert got1 == want
    got2 = {r["doc_id"]: r["position"]
            for r in epoch_shuffle(df, epoch=2).collect()}
    assert got1 != got2  # different epoch -> different permutation
    assert sorted(got2.values()) == list(range(1, 41))  # still a permutation


def test_epoch_shuffle_offsets_equals_window_strategy(spark):
    """The scale path (range exchange + per-partition numbering +
    broadcast offsets) and the legacy partition-less window must emit
    identical (key, position) pairs — including with extra carried
    columns and a non-default partition count that forces several
    range partitions (offset arithmetic across boundaries)."""
    df = spark.createDataFrame(
        [Row(doc_id=i, tag=f"t{i % 3}") for i in range(257)]
    )
    a = {(r["doc_id"], r["tag"], r["position"])
         for r in epoch_shuffle(df, epoch=4, num_partitions=7).collect()}
    b = {(r["doc_id"], r["tag"], r["position"])
         for r in epoch_shuffle(df, epoch=4, strategy="window").collect()}
    assert a == b
    assert sorted(p for _, _, p in a) == list(range(1, 258))


def test_epoch_shuffle_rejects_unknown_strategy(spark):
    df = spark.createDataFrame([Row(doc_id=1)])
    with pytest.raises(ValueError):
        epoch_shuffle(df, strategy="nope")


# ------------------------------------------------------ keep_best_duplicate
def test_keep_best_duplicate_picks_argmax_score(spark):
    rows = [
        Row(doc_id=1, text="same text", score=1.0),
        Row(doc_id=2, text="same text", score=9.0),
        Row(doc_id=3, text="same text", score=5.0),
        Row(doc_id=4, text="unique", score=0.0),
        Row(doc_id=5, text=None, score=7.0),  # NULL text dropped
    ]
    out = keep_best_duplicate(spark.createDataFrame(rows), "score")
    got = {r["doc_id"]: (r["score"], r["n_dups"]) for r in out.collect()}
    assert got == {2: (9.0, 3), 4: (0.0, 1)}


def test_keep_best_duplicate_tie_breaks_to_min_id(spark):
    rows = [Row(doc_id=i, text="t", score=3.0) for i in (7, 3, 9)]
    out = keep_best_duplicate(spark.createDataFrame(rows), "score").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3


def test_keep_best_duplicate_normalizes_whitespace_and_case(spark):
    rows = [
        Row(doc_id=1, text="Hello  World", score=1.0),
        Row(doc_id=2, text="hello world", score=2.0),
    ]
    out = keep_best_duplicate(spark.createDataFrame(rows), "score").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 2


# ------------------------------------------------------------ url spam
def test_url_spam_score_weights_and_structural_signals(spark):
    rows = [
        Row(doc_id=0, url="https://news.example.org/article/12"),
        # porn(5) + xxx(4) + viagra(5) = 14, host hyphens>=3 -> +2
        Row(doc_id=1, url="http://free-porn-xxx-now.example/viagra"),
        # digit-heavy host -> +2 only (no lexicon hit)
        Row(doc_id=2, url="http://1234567.ab/page"),
        Row(doc_id=3, url=None),
    ]
    out = {r["doc_id"]: r for r in
           url_spam_score(spark.createDataFrame(rows)).collect()}
    assert out[0]["spam_score"] == 0 and not out[0]["is_spam"]
    assert out[1]["spam_score"] == 16 and out[1]["is_spam"]
    assert out[2]["spam_score"] == 2 and not out[2]["is_spam"]
    assert out[3]["spam_score"] == 0 and not out[3]["is_spam"]


def test_url_spam_score_counts_repeats(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, url="http://h.example/casino/casino")]
    )
    out = url_spam_score(df).collect()[0]
    assert out["spam_score"] == 8  # 2 x casino(4)


# ------------------------------------------------------------ entropy
def test_token_entropy_matches_closed_form(spark):
    rows = [
        Row(doc_id=0, text="a a b"),          # H = -2/3 ln 2/3 - 1/3 ln 1/3
        Row(doc_id=1, text="x x x x"),        # H = 0
        Row(doc_id=2, text="p q r s"),        # H = ln 4
        Row(doc_id=3, text=""),               # single empty token
        Row(doc_id=4, text=None),
    ]
    out = {r["doc_id"]: r for r in
           token_entropy(spark.createDataFrame(rows)).collect()}
    h0 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert out[0]["entropy"] == round(h0, 4)
    assert out[0]["n_tokens"] == 3 and out[0]["n_distinct"] == 2
    assert out[1]["entropy"] == 0.0
    assert out[2]["entropy"] == round(math.log(4), 4)
    assert out[3]["n_tokens"] == 1 and out[3]["entropy"] == 0.0
    assert out[4]["n_tokens"] == 1 and out[4]["entropy"] == 0.0


def test_token_entropy_bounded_by_log_distinct(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    bad = token_entropy(docs).filter(
        (F.col("entropy") < -1e-9)
        | (F.col("entropy") > F.round(F.log(F.col("n_distinct")), 4) + 1e-9)
    )
    assert bad.count() == 0


# ------------------------------------------------------ bloom prefilter
def _bloom_brute_positions(s: str, m_bits: int, k: int) -> list[int]:
    h = hashlib.md5(s.encode()).hexdigest()
    return [int(h[8 * i:8 * i + 8], 16) % m_bits for i in range(k)]


def test_build_bloom_sets_exactly_the_expected_bits(spark):
    from access_log_parser_spark.operators.dedup import build_bloom

    keys = ["alpha", "beta", "gamma"]
    df = spark.createDataFrame([Row(key=s) for s in keys])
    bloom = build_bloom(df, F.col("key"), m_bits=256, k=4)
    want = [0] * 4
    for s in keys:
        for p in _bloom_brute_positions(s, 256, 4):
            want[p // 64] |= 1 << (p % 64)
    # python ints are unbounded; spark longs are signed 64-bit
    want = [w - (1 << 64) if w >= (1 << 63) else w for w in want]
    assert bloom == want


def test_bloom_might_contain_no_false_negatives(spark):
    from access_log_parser_spark.operators.dedup import (
        bloom_might_contain,
        build_bloom,
    )

    members = [f"member-{i}" for i in range(50)]
    df = spark.createDataFrame([Row(key=s) for s in members])
    bloom = build_bloom(df, F.col("key"), m_bits=4096, k=4)
    probe = spark.createDataFrame(
        [Row(key=s) for s in members + [f"other-{i}" for i in range(50)]]
    ).withColumn("hit", bloom_might_contain(F.col("key"), bloom, k=4))
    got = {r["key"]: r["hit"] for r in probe.collect()}
    assert all(got[s] for s in members)  # zero false negatives, always


def test_cross_snapshot_bloom_equals_plain_anti_join(spark):
    from access_log_parser_spark.operators.dedup import (
        cross_snapshot_dedup,
        cross_snapshot_dedup_bloom,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 300)
    new = docs.withColumn("doc_id", F.col("doc_id") + 10000)
    plain = {r["doc_id"] for r in
             cross_snapshot_dedup(new, old, near=False).collect()}
    # tiny m forces false positives: result must STILL equal the anti-join
    for m_bits in (256, 1 << 14):
        got = {r["doc_id"] for r in
               cross_snapshot_dedup_bloom(new, old, m_bits=m_bits).collect()}
        assert got == plain, m_bits


def test_cross_snapshot_bloom_passes_null_text_through(spark):
    from access_log_parser_spark.operators.dedup import (
        cross_snapshot_dedup_bloom,
    )

    old = spark.createDataFrame([Row(doc_id=1, text="seen before")])
    new = spark.createDataFrame(
        [Row(doc_id=10, text="seen before"),
         Row(doc_id=11, text=None),
         Row(doc_id=12, text="brand new")]
    )
    got = {r["doc_id"] for r in
           cross_snapshot_dedup_bloom(new, old, m_bits=256).collect()}
    assert got == {11, 12}


# ------------------------------------------------------------ robots meta
def test_robots_meta_signals_both_attribute_orders(spark):
    from access_log_parser_spark.operators.webtext import robots_meta_signals

    pages = spark.createDataFrame([
        Row(doc_id=0, html='<html><head><meta name="robots" '
                           'content="noindex, nofollow"><link rel="canonical" '
                           'href="https://ex.com/a"></head></html>'.encode()),
        Row(doc_id=1, html='<META CONTENT="nofollow" NAME="robots">'.encode()),
        Row(doc_id=2, html=b"<html><body>plain page</body></html>"),
        Row(doc_id=3, html="<meta name='robots' content='NOINDEX'>".encode()),
    ])
    out = {r["doc_id"]: r for r in robots_meta_signals(pages).collect()}
    assert out[0]["noindex"] and out[0]["nofollow"] and not out[0]["indexable"]
    assert out[0]["canonical_url"] == "https://ex.com/a"
    assert not out[1]["noindex"] and out[1]["nofollow"] and out[1]["indexable"]
    assert out[2]["robots_content"] == "" and out[2]["indexable"]
    assert out[3]["noindex"]  # single-quoted, uppercase directive


# ------------------------------------------------------------ bigram LM
def test_bigram_logprob_matches_brute_force(spark):
    from access_log_parser_spark.operators.text_quality import bigram_logprob

    corpus = {
        0: "the cat sat on the mat",
        1: "the cat sat again",
        2: "zzz",
    }
    uni: Counter = Counter(t for d in corpus.values() for t in d.split())
    T = sum(uni.values())
    bi: Counter = Counter(
        (d[i - 1], d[i])
        for d in (s.split() for s in corpus.values())
        for i in range(1, len(d))
    )
    lam = 0.7
    want = {}
    for did, s in corpus.items():
        d = s.split()
        lps = [math.log(uni[d[0]] / T)]
        for i in range(1, len(d)):
            p = (lam * bi[(d[i - 1], d[i])] / uni[d[i - 1]]
                 + (1 - lam) * uni[d[i]] / T)
            lps.append(math.log(p))
        want[did] = (len(d), round(sum(lps) / len(lps), 4))
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in corpus.items()]
    )
    got = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
           for r in bigram_logprob(df).collect()}
    assert got == want


def test_bigram_logprob_unseen_bigram_stays_finite(spark):
    from access_log_parser_spark.operators.text_quality import bigram_logprob

    # every bigram occurs once; interpolation must never hit log(0)
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b"), Row(doc_id=1, text="b a")]
    )
    out = bigram_logprob(df).collect()
    assert all(r["mean_logprob"] is not None
               and math.isfinite(r["mean_logprob"]) for r in out)


# ---------------------------------------------------------- cluster pick
def test_cluster_canonical_argmax_per_cluster(spark):
    from access_log_parser_spark.operators.dedup import cluster_canonical

    rows = [
        Row(doc_id=1, cluster_id=1, score=2.0),
        Row(doc_id=2, cluster_id=1, score=9.0),
        Row(doc_id=3, cluster_id=1, score=9.0),   # tie -> min doc_id wins
        Row(doc_id=4, cluster_id=4, score=0.5),   # singleton
    ]
    out = {r["cluster_id"]: r for r in
           cluster_canonical(spark.createDataFrame(rows), "score").collect()}
    assert out[1]["doc_id"] == 2 and out[1]["n_members"] == 3
    assert out[4]["doc_id"] == 4 and out[4]["n_members"] == 1


def test_cluster_canonical_composes_with_connected_components(spark):
    from access_log_parser_spark.operators.dedup import (
        cluster_canonical,
        connected_components,
    )

    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    pairs = spark.createDataFrame(
        [Row(id_a=0, id_b=1), Row(id_a=1, id_b=2), Row(id_a=3, id_b=4)]
    )
    assign = connected_components(nodes, pairs)
    scored = assign.withColumn("score", (F.col("doc_id") % 3).cast("double"))
    out = {r["cluster_id"]: r["doc_id"] for r in
           cluster_canonical(scored, "score").collect()}
    # cluster {0,1,2}: scores 0,1,2 -> doc 2; cluster {3,4}: 0,1 -> doc 4
    assert out == {0: 2, 3: 4, 5: 5}


# ---------------------------------------------------------------- drift
def test_token_distribution_drift_matches_brute_force(spark):
    from access_log_parser_spark.operators.text_quality import (
        token_distribution_drift,
    )

    old = {0: "a a b c", 1: "a b"}
    new = {0: "a c c c", 1: "d"}
    B, S = 32, 1.0
    odf = spark.createDataFrame([Row(doc_id=k, text=v) for k, v in old.items()])
    ndf = spark.createDataFrame([Row(doc_id=k, text=v) for k, v in new.items()])
    got = {r["bucket"]: r for r in
           token_distribution_drift(odf, ndf, buckets=B, smooth=S).collect()}

    oc: Counter = Counter(_bucket(t, B) for v in old.values() for t in v.split())
    nc: Counter = Counter(_bucket(t, B) for v in new.values() for t in v.split())
    to, tn = sum(oc.values()), sum(nc.values())
    assert set(got) == set(oc) | set(nc)
    for b in got:
        po = (oc.get(b, 0) + S) / (to + S * B)
        pn = (nc.get(b, 0) + S) / (tn + S * B)
        assert got[b]["c_old"] == oc.get(b, 0)
        assert got[b]["c_new"] == nc.get(b, 0)
        assert abs(got[b]["p_old"] - round(po, 6)) < 1e-12
        assert abs(got[b]["p_new"] - round(pn, 6)) < 1e-12
        assert abs(got[b]["kl_term"] - round(pn * math.log(pn / po), 6)) < 1e-12


def test_token_distribution_drift_zero_for_identical_corpora(spark):
    from access_log_parser_spark.operators.text_quality import (
        token_distribution_drift,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    total = (
        token_distribution_drift(docs, docs, buckets=64)
        .agg(F.sum(F.abs(F.col("kl_term"))))
        .collect()[0][0]
    )
    assert abs(total) < 1e-9


# --------------------------------------------------------- main content
def test_main_content_extract_drops_link_dense_chrome(spark):
    from access_log_parser_spark.operators.webtext import main_content_extract

    html = (
        b'<html><head><script>nav()</script></head><body>'
        b'<div><a href="/">Home</a> | <a href="/about">About</a> | '
        b'<a href="/contact">Contact us</a></div>'
        b'<p>This is the actual article body with plenty of informative '
        b'prose that goes on for a while.</p>'
        b'<p>Second paragraph of real content, long enough to clear the '
        b'minimum character bar easily.</p>'
        b'<div>Read more: <a href="/a">related story one</a> '
        b'<a href="/b">related story two</a></div>'
        b'<footer><a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>'
        b'</body></html>'
    )
    out = main_content_extract(
        spark.createDataFrame([Row(doc_id=0, html=html)])
    ).collect()[0]
    assert out["n_kept"] == 2
    lines = out["main_text"].split("\n")
    assert lines[0].startswith("this is the actual article body")
    assert lines[1].startswith("second paragraph of real content")
    assert "home" not in out["main_text"]       # nav dropped
    assert "related story" not in out["main_text"]  # link-list dropped
    assert "privacy" not in out["main_text"]    # footer dropped


def test_main_content_extract_short_and_empty_blocks(spark):
    from access_log_parser_spark.operators.webtext import main_content_extract

    html = b"<p>tiny</p><p>a block of prose that is clearly above the minimum length bar</p>"
    out = main_content_extract(
        spark.createDataFrame([Row(doc_id=0, html=html)])
    ).collect()[0]
    assert out["n_kept"] == 1  # 'tiny' fails min_chars
    plain = main_content_extract(
        spark.createDataFrame([Row(doc_id=1, html=b"no tags at all but definitely long enough to keep around")])
    ).collect()[0]
    assert plain["n_kept"] == 1 and plain["main_text"].startswith("no tags")


# ------------------------------------------------------------ LID margin
def test_lang_id_margin_confidence(spark):
    from access_log_parser_spark.operators.text_quality import lang_id_margin

    rows = [
        # many distinct en stopwords, zero others -> confident
        Row(doc_id=0, text="the and of to a in is it that for"),
        # one en hit, one de hit -> margin 0, not confident
        Row(doc_id=1, text="the der"),
        # no stopwords at all -> margin 0
        Row(doc_id=2, text="zzz qqq"),
    ]
    out = {r["doc_id"]: r for r in
           lang_id_margin(spark.createDataFrame(rows)).collect()}
    assert out[0]["pred_lang"] == "en" and out[0]["margin"] == 10
    assert out[0]["confident"]
    assert out[1]["margin"] == 0 and not out[1]["confident"]
    assert out[2]["margin"] == 0 and not out[2]["confident"]


def test_lang_id_margin_pred_matches_lang_id(spark):
    from access_log_parser_spark.operators.text_quality import (
        lang_id,
        lang_id_margin,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    a = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    b = {r["doc_id"]: r["pred_lang"] for r in lang_id_margin(docs).collect()}
    assert a == b


# ------------------------------------------------------- shard checksums
def test_shard_checksums_match_python_and_ignore_order(spark):
    from access_log_parser_spark.operators.sampling import shard_checksums

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(100)
    rows = docs.collect()

    def bucket(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 4

    def row_h(k: int, t: str) -> int:
        s = f"{k}\x1f{t if t is not None else ''}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want: dict[int, tuple[int, int]] = {}
    for r in rows:
        b = bucket(r["doc_id"])
        n, x = want.get(b, (0, 0))
        want[b] = (n + 1, x ^ row_h(r["doc_id"], r["text"]))
    got = {r["shard"]: (r["n_rows"], r["checksum"])
           for r in shard_checksums(docs, n_shards=4).collect()}
    assert got == want
    # order/partitioning invariance
    got2 = {r["shard"]: (r["n_rows"], r["checksum"])
            for r in shard_checksums(
                docs.orderBy(F.rand(7)).repartition(13), n_shards=4
            ).collect()}
    assert got2 == got


# --------------------------------------------------------- pack manifest
def test_pack_manifest_offsets_and_order(spark):
    from access_log_parser_spark.operators.packing import (
        pack_manifest,
        pack_streaming,
    )

    rows = [Row(doc_id=i, shard=i % 2, position=i, ws_tokens=10 + i)
            for i in range(10)]
    packed = pack_streaming(
        spark.createDataFrame(rows), budget=30,
        shard_col="shard", order_col="position", token_col="ws_tokens",
    )
    out = pack_manifest(packed).collect()
    by_key = {(r["shard"], r["pack_id"]): r for r in out}
    # python replay of the streaming bin-fill + offsets
    want: dict[tuple, list[tuple[int, int]]] = {}
    for s in (0, 1):
        cum = 0
        for i in sorted(r["doc_id"] for r in rows if r["shard"] == s):
            pack = cum // 30
            want.setdefault((s, pack), []).append((i, 10 + i))
            cum += 10 + i
    assert set(by_key) == set(want)
    for k, members in want.items():
        r = by_key[k]
        assert list(r["doc_ids"]) == [m[0] for m in members]
        offs, acc = [], 0
        for _, t in members:
            offs.append(acc)
            acc += t
        assert list(r["offsets"]) == offs
        assert r["pack_tokens"] == acc and r["n_docs"] == len(members)
        # boundary identity: consecutive offset deltas are member tokens
        for j in range(len(members) - 1):
            assert offs[j + 1] - offs[j] == members[j][1]


# ------------------------------------------------------------ link graph
def test_extract_links_pairs_href_with_anchor(spark):
    from access_log_parser_spark.operators.webtext import extract_links

    html = (b'<p>intro <a href="https://a.example/x">First <b>Link</b></a>'
            b' middle <A HREF=\'/rel\'>second</A>'
            b' <a name="no-href">anchor only</a></p>')
    out = extract_links(
        spark.createDataFrame([Row(doc_id=7, html=html)])
    ).collect()
    got = {(r["href"], r["anchor"]) for r in out}
    assert ("https://a.example/x", "First Link") in got
    assert ("/rel", "second") in got
    assert ("", "anchor only") in got  # tag without href -> empty href
    assert extract_links(
        spark.createDataFrame([Row(doc_id=8, html=b"<p>no links</p>")])
    ).count() == 0


def _pagerank_brute(edges: set[tuple[str, str]], iters: int, d: float):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = Counter(u for u, _ in edges)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        mass = {v: 0.0 for v in nodes}
        for u, v in sorted(edges):
            mass[v] += rank[u] / out[u]
        rank = {v: (1 - d) / n + d * mass[v] for v in nodes}
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_matches_brute_force_and_sums_sensibly(spark):
    from access_log_parser_spark.operators.graph import pagerank

    rng = random.Random(23)
    edges = {(f"h{rng.randint(0, 9)}", f"h{rng.randint(0, 9)}")
             for _ in range(40)}
    edges = {(u, v) for u, v in edges if u != v}
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _pagerank_brute(edges, 3, 0.85)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) <= 1e-6, (v, got[v], want[v])
    # hub check on a star graph: everyone links to 'hub'
    star = spark.createDataFrame(
        [Row(src=f"s{i}", dst="hub") for i in range(5)]
    )
    sr = {r["node"]: r["rank"] for r in pagerank(star, iterations=2).collect()}
    assert sr["hub"] == max(sr.values())


def test_pagerank_duplicate_edges_collapse(spark):
    from access_log_parser_spark.operators.graph import pagerank

    a = spark.createDataFrame([Row(src="a", dst="b")])
    b = spark.createDataFrame([Row(src="a", dst="b")] * 5)
    ra = {r["node"]: r["rank"] for r in pagerank(a, iterations=2).collect()}
    rb = {r["node"]: r["rank"] for r in pagerank(b, iterations=2).collect()}
    assert ra == rb


def _hits_brute(edges: set[tuple[str, str]], iters: int):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {v: 0.0 for v in nodes}
        for u, v in sorted(edges):
            raw_a[v] += hub[u]
        z = sum(raw_a.values())
        auth = {v: raw_a[v] / z for v in nodes}
        raw_h = {v: 0.0 for v in nodes}
        for u, v in sorted(edges):
            raw_h[u] += auth[v]
        z = sum(raw_h.values())
        hub = {v: raw_h[v] / z for v in nodes}
    return {v: (round(hub[v], 6), round(auth[v], 6)) for v in nodes}


def test_hits_matches_brute_force(spark):
    from access_log_parser_spark.operators.graph import hits

    rng = random.Random(31)
    edges = {(f"h{rng.randint(0, 7)}", f"h{rng.randint(0, 7)}")
             for _ in range(30)}
    edges = {(u, v) for u, v in edges if u != v}
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, iterations=3).collect()}
    want = _hits_brute(edges, 3)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v][0] - want[v][0]) <= 1e-6, (v, got[v], want[v])
        assert abs(got[v][1] - want[v][1]) <= 1e-6, (v, got[v], want[v])


def test_hits_directory_vs_authority(spark):
    from access_log_parser_spark.operators.graph import hits

    # d1/d2 are pure directories linking to authorities a1/a2
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s in ("d1", "d2") for d in ("a1", "a2")]
    )
    out = {r["node"]: r for r in hits(df, iterations=2).collect()}
    assert out["d1"]["hub"] > out["a1"]["hub"]
    assert out["a1"]["authority"] > out["d1"]["authority"]
    assert out["a1"]["authority"] == out["a2"]["authority"]  # symmetric


# ------------------------------------------------------------ robots.txt
ROBOTS = """# comments ignored
User-agent: googlebot
Disallow: /private/

User-agent: *
User-agent: trainingbot
Disallow: /tmp/
Allow: /tmp/public/
Disallow:

Sitemap: https://h1.example/sitemap.xml
"""


def test_robots_txt_rules_groups_and_agent_match(spark):
    from access_log_parser_spark.operators.webtext import robots_txt_rules

    df = spark.createDataFrame([Row(host="h1.example", robots_txt=ROBOTS)])
    got = {(r["allow"], r["path"]) for r in robots_txt_rules(df).collect()}
    # the googlebot group does NOT apply to '*'; empty Disallow drops
    assert got == {(False, "/tmp/"), (True, "/tmp/public/")}
    named = {(r["allow"], r["path"])
             for r in robots_txt_rules(df, agent="GoogleBot").collect()}
    # googlebot matches its own group AND the * group
    assert named == {(False, "/private/"), (False, "/tmp/"),
                     (True, "/tmp/public/")}


def test_robots_allowed_longest_match_and_tiebreak(spark):
    from access_log_parser_spark.operators.webtext import (
        robots_allowed,
        robots_txt_rules,
    )

    df = spark.createDataFrame([Row(host="h1.example", robots_txt=ROBOTS)])
    rules = robots_txt_rules(df)
    urls = spark.createDataFrame([
        Row(url="https://h1.example/tmp/secret"),        # /tmp/ disallow
        Row(url="https://h1.example/tmp/public/ok"),     # longer allow wins
        Row(url="https://h1.example/anything/else"),     # no rule -> allowed
        Row(url="https://other.example/tmp/secret"),     # host w/o rules
    ])
    got = {r["url"]: r["fetch_allowed"]
           for r in robots_allowed(urls, rules).collect()}
    assert got == {
        "https://h1.example/tmp/secret": False,
        "https://h1.example/tmp/public/ok": True,
        "https://h1.example/anything/else": True,
        "https://other.example/tmp/secret": True,
    }


def test_robots_allowed_equal_length_allow_wins(spark):
    from access_log_parser_spark.operators.webtext import robots_allowed

    rules = spark.createDataFrame([
        Row(host="h.example", allow=True, path="/a/", path_len=3),
        Row(host="h.example", allow=False, path="/a/", path_len=3),
    ])
    urls = spark.createDataFrame([Row(url="https://h.example/a/x")])
    out = robots_allowed(urls, rules).collect()[0]
    assert out["fetch_allowed"] is True  # REP tiebreak: Allow wins


# -------------------------------------------------------- stratified topk
def test_stratified_topk_argmax_per_stratum(spark):
    from access_log_parser_spark.operators.sampling import stratified_topk

    rows = [Row(doc_id=i, source=f"s{i % 3}", score=float((i * 7) % 11))
            for i in range(30)]
    out = stratified_topk(
        spark.createDataFrame(rows), "source", "score", k=4
    ).collect()
    by_s: dict[str, list] = {}
    for r in out:
        by_s.setdefault(r["source"], []).append((r["score"], r["doc_id"]))
    for s, got in by_s.items():
        pool = sorted(
            ((float((i * 7) % 11), i) for i in range(30) if f"s{i % 3}" == s),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        assert sorted(got, key=lambda t: (-t[0], t[1])) == pool, s
    assert all(len(v) == 4 for v in by_s.values())


# ------------------------------------------------------------- sitemaps
def test_sitemap_locs_positions_and_whitespace(spark):
    from access_log_parser_spark.operators.webtext import sitemap_locs

    xml = ("<?xml version=\"1.0\"?><urlset>"
           "<url><loc> https://h.example/a </loc></url>"
           "<url><LOC>https://h.example/b</LOC></url>"
           "<url><lastmod>2024-01-01</lastmod></url></urlset>")
    out = sitemap_locs(
        spark.createDataFrame([Row(host="h.example", sitemap_xml=xml),
                               Row(host="empty.example", sitemap_xml=None)])
    ).collect()
    got = {(r["host"], r["position"]): r["loc"] for r in out}
    assert got == {("h.example", 1): "https://h.example/a",
                   ("h.example", 2): "https://h.example/b"}
