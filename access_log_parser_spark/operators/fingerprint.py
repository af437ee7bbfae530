"""Rolling-hash document fingerprinting (winnowing).

Implements the winnowing algorithm of Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003,
public paper): hash every k-gram of tokens with a Karp-Rabin polynomial
rolling hash, slide a window of ``w`` consecutive k-gram hashes over the
sequence, and select the minimum of each window (rightmost minimum on
ties, the paper's "robust winnowing" rule). The selected (position,
hash) set is the document's fingerprint; any shared token run of length
>= w + k - 1 between two documents is guaranteed to surface at least one
shared fingerprint hash (theorem 2 of the paper), which makes the
fingerprints a compact index for plagiarism / syndication / license-block
overlap detection that whole-document MinHash misses.

This is the "document fingerprinting (rolling hash)" tier of the
training-data pipeline, complementing the reference-parity parsing layer
(reference has no analogue; the nearest reference machinery is the
regex field extraction in parser_regex.go, which is per-line, not
cross-document).

Scale notes (the 100 TB story):

- fingerprint extraction is a pure per-row expression chain (tokenize ->
  32-bit md5 token codes -> k-gram polynomial hashes -> window minima):
  zero shuffles, whole-stage codegen end to end, linear in document
  length (k and w are constants);
- the k-gram hash ships two equivalent forms: the vectorized closed-form
  polynomial (``transform`` over positions, O(n*k) fused multiply-adds
  with no intermediate array copies — the production path) and the
  literal Karp-Rabin O(n) rolling recurrence (``aggregate`` fold —
  kept as the algorithmic pin; its per-step array append makes Spark
  copy the accumulator, so the closed form is the better physical plan
  even though the recurrence does fewer multiplies);
- all arithmetic stays below 2^53 (32-bit token codes, base 33, k<=5),
  so int64 never wraps and a DuckDB oracle reproduces every hash
  exactly with no modular reduction;
- overlap detection is an inverted-index join on the fingerprint hash
  (shuffle on ``fp``), never an all-pairs cross join; ubiquitous
  fingerprints are dropped by a document-frequency cap before the
  self-join, the same stop-shingle discipline as dedup.ngram_jaccard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: k-gram length in tokens, winnow window in k-grams, polynomial base.
#: With 32-bit token codes and B=33, the largest k-gram hash is
#: < 2^32 * (33^4 + ... + 1) < 2^53 — exact in int64 and in DuckDB.
KGRAM_K = 5
WINNOW_W = 4
POLY_B = 33


def token_codes(text: Column) -> Column:
    """Lowercased whitespace tokens -> 32-bit md5-derived codes
    (``conv(substr(md5(tok),1,8),16,10)``), portable to the DuckDB
    oracle as ``CAST('0x' || substr(md5(tok),1,8) AS BIGINT)``."""
    toks = F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != ""
    )
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )


def kgram_hashes(codes: Column, k: int = KGRAM_K, b: int = POLY_B) -> Column:
    """Karp-Rabin k-gram hashes, closed form: hash_i = sum_j c[i+j] *
    b^(k-1-j). Vectorized ``transform`` over start positions with an
    ``aggregate`` Horner fold per gram — O(n*k) fused int64 ops, no
    accumulator array copies. Empty when the document has < k tokens."""
    m = F.size(codes) - k + 1
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.aggregate(
                F.slice(codes, i, k),
                F.lit(0).cast("long"),
                lambda g, c: g * b + c,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))


def kgram_hashes_rolling(
    codes: Column, k: int = KGRAM_K, b: int = POLY_B
) -> Column:
    """The literal O(n) rolling recurrence: g' = (g - c_out * b^(k-1)) * b
    + c_in. Provably equal to :func:`kgram_hashes` (same polynomial, and
    no value exceeds 2^53 so int64 arithmetic is exact) — pinned by
    tests/test_fingerprint.py. Kept as the algorithmic reference; the
    closed form is the production path because Spark's ``aggregate``
    copies the array accumulator on every ``concat`` append, making this
    form O(n^2) in allocation despite O(n) in multiplies."""
    bk1 = b ** (k - 1)
    first = F.aggregate(
        F.slice(codes, 1, k), F.lit(0).cast("long"), lambda g, c: g * b + c
    )
    m = F.size(codes) - k + 1
    rolled = F.aggregate(
        F.sequence(F.lit(1), m - 1),
        F.struct(first.alias("g"), F.array(first).alias("out")),
        lambda acc, i: F.struct(
            (
                (acc["g"] - F.element_at(codes, i) * bk1) * b
                + F.element_at(codes, i + k)
            ).alias("g"),
            F.concat(
                acc["out"],
                F.array(
                    (acc["g"] - F.element_at(codes, i) * bk1) * b
                    + F.element_at(codes, i + k)
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    return F.when(m >= 2, rolled).otherwise(
        F.when(m == 1, F.array(first)).otherwise(
            F.array().cast("array<long>")
        )
    )


def _winnow_selected(grams: Column, w: int = WINNOW_W) -> Column:
    """Window minima with the rightmost-min tiebreak: for each window
    start j, select struct(pos, fp) where fp = min(grams[j..j+w-1]) and
    pos is the LAST index attaining it (robust winnowing — reusing the
    previous selection minimizes fingerprint count). Documents with
    fewer than w k-grams still emit one fingerprint (slice truncates),
    preserving the paper's every-document-fingerprinted guarantee."""
    nw = F.greatest(F.size(grams) - w + 1, F.lit(1))

    def sel(j):
        sl = F.slice(grams, j, w)
        mn = F.array_min(sl)
        rp = F.size(sl).cast("long") - F.array_position(F.reverse(sl), mn)
        return F.struct((j.cast("long") + rp).alias("pos"), mn.alias("fp"))

    return F.when(
        F.size(grams) >= 1, F.transform(F.sequence(F.lit(1), nw), sel)
    ).otherwise(F.array().cast("array<struct<pos:long,fp:long>>"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = KGRAM_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Per-document winnowing fingerprints: distinct (doc_id, pos, fp)
    rows, pos = 1-based k-gram index of the selected hash. NULL-text and
    sub-k-token documents emit no rows (nothing to fingerprint).

    Each stage (codes -> grams -> window minima) is materialized in its
    own projection: the window selector references the gram array ~4x
    per window, and Spark does not share subexpressions across lambda
    references, so inlining the md5 + polynomial subtree would re-derive
    it O(windows) times per row (measured: 500 tiny docs went from
    seconds to minutes when inlined)."""
    codes = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col("doc_id"), token_codes(F.col(text_col)).alias("codes"))
    )
    grams = codes.select("doc_id", kgram_hashes(F.col("codes"), k).alias("grams"))
    return (
        grams.select(
            "doc_id", F.explode(_winnow_selected(F.col("grams"), w)).alias("s")
        )
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
        .distinct()
    )


def fingerprint_overlap(
    df: DataFrame,
    min_shared: int = 2,
    max_df: int = 50,
    text_col: str = "text",
    k: int = KGRAM_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct fingerprint
    hashes — the winnowing overlap detector. Plan shape: distinct
    (doc_id, fp) -> drop fingerprints appearing in more than ``max_df``
    documents (stop-fingerprints carry no pair signal and would square
    the join fan-out) -> self-join on fp with id_a < id_b -> count
    shared hashes per pair. One shuffle on fp plus the pair aggregation;
    never all-pairs."""
    fps = (
        winnow_fingerprints(df, text_col=text_col, k=k, w=w)
        .select("doc_id", "fp")
        .distinct()
    )
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") <= max_df)
        .select("fp")
    )
    keyed = fps.join(rare, "fp")
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
