"""Text analysis operators for training-data pipelines.

All of these run JVM-side (built-in ``pyspark.sql.functions``, inside
whole-stage codegen) — no Python on the hot path. Each is defined with
deterministic, SQL-expressible semantics so a DuckDB oracle can verify it
bit-for-bit (see ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deliberately tiny, deterministic per-language stopword sets (heuristic
# n-gram/stopword language ID — a real pipeline would broadcast a model)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "que"],
}

WORD_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"  # BPE-ish coarse token classes


def tokens(c: Column) -> Column:
    """Whitespace tokenization (split of trimmed text)."""
    return F.split(F.trim(c), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + regex (BPE-ish) token count per doc."""
    return df.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_REGEX), 0))
        .cast("long")
        .alias("re_tokens"),
    )


def _quality_exprs(t: Column) -> dict[str, Column]:
    """The quality-feature expressions over a text column. Shared by the
    frame-returning :func:`quality_score` and the column-returning
    :func:`quality_score_col` so a pipeline can compose the score as a
    projection (withColumn + filter) instead of a doc_id join-back."""
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9 ]", ""))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    hits = F.size(F.array_intersect(toks, sw))
    mean_len = F.round((n_chars - n_tokens + 1) / n_tokens, 6)
    punct_ratio = F.round(punct / n_chars, 6)
    score = F.round(
        F.least(F.lit(1.0), hits / F.lit(10.0)) * 0.5
        + F.when((mean_len >= 3) & (mean_len <= 10), 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0),
        6,
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_len,
        "punct_ratio": punct_ratio,
        "stopword_hits": hits,
        "quality": score,
    }


def quality_score_col(text: Column) -> Column:
    """Composite quality score as ONE Column expression — compose into an
    existing projection (``withColumn('quality', ...)``) with no join and
    no extra shuffle."""
    return _quality_exprs(text)["quality"]


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score:

    - n_chars, n_tokens, mean token length;
    - punct_ratio: share of chars outside [A-Za-z0-9 and space];
    - stopword_hits: distinct English stopwords present;
    - score: bounded composite (higher = more natural-language-like).
    """
    e = _quality_exprs(F.col(text_col))
    n_chars, n_tokens = e["n_chars"], e["n_tokens"]
    mean_len, punct_ratio = e["mean_token_len"], e["punct_ratio"]
    hits, score = e["stopword_hits"], e["quality"]
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        hits.cast("long").alias("stopword_hits"),
        score.alias("quality"),
    )


def _lang_best(text: Column) -> Column:
    toks = tokens(text)
    scores = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array([F.lit(w) for w in STOPWORDS[lang]]))
            ).alias("hits"),
            # invert lang for tie-break: array_max picks highest hits, then
            # lexicographically SMALLEST language (en < es) via reversed cmp
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(STOPWORDS, reverse=True)
    ]
    return F.array_max(F.array(*scores))


def pred_lang_col(text: Column) -> Column:
    """Stopword-overlap language prediction as ONE Column expression —
    identical values to ``lang_id(...).pred_lang``, for composing a
    language gate as a projection with no join-back."""
    return _lang_best(text)["lang"]


def fingerprint_col(text: Column) -> Column:
    """The exact-dedup fingerprint (md5 of whitespace-normalized
    lowercased text) as ONE Column expression."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: distinct-stopword hits per language,
    argmax with deterministic lexicographic tie-break."""
    best = _lang_best(F.col(text_col))
    return df.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("pred_hits"),
    )


# tiny deterministic per-language character-trigram profiles (the n-gram
# heuristic variant of language ID; a real pipeline broadcasts profiles
# learned from a corpus)
TRIGRAM_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of", "of "],
    "de": ["der", "er ", " de", "ich", "ch ", "ein", " ei", "und", " un", "nd "],
    "fr": [" le", "le ", "es ", " de", "de ", "ent", "nt ", "que", " qu", "ue "],
    "es": [" de", "de ", "os ", " la", "la ", "que", " qu", "ue ", "ión", "el "],
}


def char_trigrams(c: Column) -> Column:
    """Distinct character 3-grams of lowercased text (JVM-side: sequence
    of slice offsets -> substrings)."""
    t = F.lower(c)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(3))))


def lang_id_ngram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-n-gram language ID: distinct-trigram overlap with each
    language profile, argmax with deterministic tie-break (same shape as
    :func:`lang_id`, different feature space)."""
    grams = char_trigrams(F.col(text_col))
    scores = [
        F.struct(
            F.size(
                F.array_intersect(
                    grams, F.array([F.lit(g) for g in TRIGRAM_PROFILES[lang]])
                )
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(TRIGRAM_PROFILES, reverse=True)
    ]
    best = F.array_max(F.array(*scores))
    return df.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("pred_hits"),
    )


def vocab_topk(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus-level top-k tokens by total frequency (deterministic
    tie-break: token ascending).

    Plan shape at scale: explode -> partial count per partition (map-side
    combine) -> one shuffle on token -> final count -> TakeOrdered(k) on
    the driver. The result is k rows regardless of corpus size; the only
    full-data shuffle is keyed on the token with partial aggregation, so
    skewed tokens ("the") are pre-reduced map-side.
    """
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


def doc_frequency_idf(
    df: DataFrame, min_df: int = 2, text_col: str = "text"
) -> DataFrame:
    """Per-token document frequency + smoothed IDF:
    ``idf = round(ln((N + 1) / (df + 1)), 6)``.

    Tokens are counted once per document (distinct within doc), the
    standard DF definition. N (corpus size) rides along via a broadcast
    1-row cross join, so the plan stays a single token-keyed shuffle with
    map-side partial counts.
    """
    per_doc = df.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )
    dfreq = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    out = dfreq.join(F.broadcast(n))
    idf = F.round(F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6)
    return out.filter(F.col("df") >= min_df).select(
        "token", F.col("df").cast("long").alias("doc_freq"), idf.alias("idf")
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", broadcast_vocab: bool = True
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheapest LM-style fluency signal a curation
    pipeline runs (a doc of globally-rare tokens scores low; gibberish
    and boilerplate separate cleanly from median prose):

        p(tok) = corpus_count(tok) / corpus_total
        mean_logprob(doc) = round(avg over doc tokens of ln(p(tok)), 4)

    Returns (doc_id, n_tokens, mean_logprob). Self-contained: the model
    IS the corpus frequency table, so the oracle reproduces it exactly —
    no external model file.

    Plan shape at scale: explode -> token-keyed count (ONE shuffle with
    map-side partial agg) builds the vocab; token scores reach the doc
    rows via a broadcast hash join on the vocab (web-corpus vocabs are
    dimension-sized after the count; set ``broadcast_vocab=False`` for
    an open-ended token space and it becomes a uniform token-keyed
    shuffle join); final per-doc re-agg is the second fact-side shuffle.
    4-dp rounding absorbs summation-order float drift across engines.
    """
    toks = df.select(
        F.col("doc_id"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    vocab = counts.join(F.broadcast(total)).select(
        "token", F.log(F.col("c") / F.col("t")).alias("_logp")
    )
    scored = toks.join(F.broadcast(vocab) if broadcast_vocab else vocab, "token")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("_logp"), 4).alias("mean_logprob"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text —
    the exact-dedup key, stable across engines."""
    return df.select("doc_id", fingerprint_col(F.col(text_col)).alias("fp"))


def linear_quality_score(
    df: DataFrame, text_col: str = "text", dim: int = 1024, mod: int = 997
) -> DataFrame:
    """Serving path for a linear (fastText-style) quality classifier:
    hash each token into a ``dim``-bucket feature space, sum the bucket
    weights, average over tokens, squash with a sigmoid. This is how
    trained quality/toxicity/language classifiers actually run inside a
    Spark curation pipeline — the model is a weight table keyed by
    feature hash, applied as pure column expressions (whole-stage
    codegen, no UDF, no shuffle).

    The weight table here is a deterministic placeholder,
    ``w(j) = ((j * 2654435761) % mod) / mod - 0.5`` — integer arithmetic
    on the bucket id, so the oracle reproduces scores bit-for-bit. A
    deployment swaps in trained weights by replacing ``_w`` with an
    ``element_at(lit(weights), j+1)`` lookup over a broadcast literal
    array (same plan shape; the hash/fold/sigmoid scaffolding is what
    this operator pins down).

    Returns (doc_id, n_tokens, score) with score rounded to 4 dp (the
    repo's standard float-drift absorber for cross-engine sums).
    """
    return df.select(
        "doc_id",
        F.size(tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("long")
        .alias("n_tokens"),
        linear_quality_score_col(F.col(text_col), dim, mod).alias("score"),
    )


def linear_quality_score_col(text, dim: int = 1024, mod: int = 997) -> Column:
    """Column variant of :func:`linear_quality_score` — compose into an
    existing projection (the curation composites gate on this without a
    doc_id join-back)."""
    toks = tokens(F.coalesce(text, F.lit("")))

    def _w(tok):
        j = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim
        return ((j * F.lit(2654435761)) % mod) / F.lit(float(mod)) - F.lit(0.5)

    z = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + _w(t))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-(z / F.size(toks)))), 4)


# Character classes shared by the Spark expression and the SQL oracle —
# RE2 (DuckDB) and java.util.regex agree on \x{...} ranges.
SCRIPT_CLASSES = (
    ("n_latin", "[A-Za-z]"),
    ("n_digit", "[0-9]"),
    ("n_cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("n_cjk", "[\\x{4E00}-\\x{9FFF}]"),
    ("n_arabic", "[\\x{0600}-\\x{06FF}]"),
)


def script_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode script histogram + dominant script — the
    cheap writing-system gate that runs before any statistical lang-id
    (a doc claiming lang='en' that is 90% CJK chars is mislabeled).
    Counts are exact integers (``length(text) - length(strip(class))``),
    so the dominant-script argmax is engine-exact with a fixed
    first-wins tie order (declaration order of SCRIPT_CLASSES). Pure
    projection, no shuffle."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = script_count_cols(t)
    return df.select(
        "doc_id",
        *[counts[name].alias(name) for name, _ in SCRIPT_CLASSES],
        dominant_script_col(t).alias("main_script"),
    )


def script_count_cols(text) -> dict[str, Column]:
    """Exact per-class character counts (column variants)."""
    return {
        name: (F.length(text) - F.length(F.regexp_replace(text, pat, ""))).cast(
            "long"
        )
        for name, pat in SCRIPT_CLASSES
    }


def dominant_script_col(text) -> Column:
    """First-wins argmax over :data:`SCRIPT_CLASSES` counts ('none' when
    all zero) — compose into an existing projection."""
    counts = script_count_cols(text)
    best = F.lit("none")
    best_n = F.lit(0).cast("long")
    for name, _ in SCRIPT_CLASSES:  # first-wins: earlier class keeps ties
        cond = counts[name] > best_n
        best = F.when(cond, F.lit(name[2:])).otherwise(best)
        best_n = F.when(cond, counts[name]).otherwise(best_n)
    return best


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "source",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus-unigram LM (same model as
    :func:`unigram_logprob`), then split each ``key_col`` group (CCNet
    buckets per LANGUAGE; here per source domain) into ``n_buckets``
    equal-frequency tiers — head / middle / tail. Downstream pipelines
    keep the head, re-sample the middle, and drop or quarantine the
    tail; the tier boundary being a per-group QUANTILE (not a global
    threshold) is the point — it adapts to each language's score scale.

    Bucket assignment is ``ntile`` over ``(mean_logprob DESC, doc_id)``
    — a total order, so the cut is deterministic and the oracle replays
    it exactly (scores are 4-dp rounded before ordering, the repo's
    standard cross-engine float absorber).

    Plan shape: the LM is one token-keyed count shuffle + a broadcast
    score join (see :func:`unigram_logprob`); the bucketing is one
    exchange on ``key_col`` + an in-partition sort. At 10^12 rows a
    single language group exceeds one partition — the deploy-time
    variant computes the two cutoff scores per group first (exact rank
    via count + ordered aggregation, or approx quantiles when a ~1%%
    boundary error is acceptable) and assigns tiers as a projection;
    the equal-frequency semantics here are the reference the cheap
    variant is validated against.

    Returns (doc_id, <key_col>, n_tokens, mean_logprob, bucket) with
    bucket 1 = most fluent (head).
    """
    toks = df.select(
        F.col("doc_id"),
        F.col(key_col).alias("_pb_key"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    vocab = counts.join(F.broadcast(total)).select(
        "token", F.log(F.col("c") / F.col("t")).alias("_logp")
    )
    scored = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("doc_id", "_pb_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("_logp"), 4).alias("mean_logprob"),
        )
    )
    w = Window.partitionBy("_pb_key").orderBy(
        F.col("mean_logprob").desc(), F.col("doc_id")
    )
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w)).select(
        "doc_id",
        F.col("_pb_key").alias(key_col),
        "n_tokens",
        "mean_logprob",
        "bucket",
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the information-density quality signal: boilerplate and keyword-stuffed
    spam repeat a few tokens (low entropy), fluent prose spreads mass
    across its vocabulary (high entropy, bounded by ln(distinct)).

    Computed by the shuffle-friendly identity

        H = -sum (c/n) ln(c/n)  =  ln(n) - (sum c ln c) / n

    so one (doc_id, token) count plus one per-doc agg suffices — no
    window, no within-row O(distinct x n) scan. Returns
    (doc_id, n_tokens, n_distinct, entropy), entropy rounded to 4 dp
    (the repo's float-drift absorber). Empty/NULL text tokenizes to the
    single empty token (the :func:`tokens` split semantics the oracles
    share), so such docs yield (1, 1, 0.0).

    Plan at 100 TB: explode -> two partial-agg shuffles keyed on
    doc_id(+token); output one row per doc. Contrast
    repetition_signals' top-word HOF, which trades the shuffle for a
    capped within-row scan — entropy wants exact global-in-doc counts,
    so the keyed agg is the right plan.
    """
    toks = df.select(
        "doc_id",
        F.explode_outer(
            tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("token"),
    )
    per_tok = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    real = F.col("token").isNotNull()
    n = F.sum(F.when(real, F.col("c")).otherwise(0)).cast("long")
    s = F.sum(F.when(real, F.col("c") * F.log(F.col("c"))).otherwise(0.0))
    return per_tok.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.when(real, 1)).cast("long").alias("n_distinct"),
        F.coalesce(
            F.round(F.log(n) - s / n, 4), F.lit(0.0)
        ).alias("entropy"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    lam: float = 0.7,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated
    bigram/unigram LM trained on the corpus itself — the next step up
    from :func:`unigram_logprob` toward the KenLM-style perplexity
    filter CCNet runs:

        p(tok_i | tok_{i-1}) = lam * c(prev,tok)/c(prev)
                             + (1-lam) * c(tok)/T          (i >= 1)
        p(tok_0)             = c(tok_0)/T                   (doc start)
        mean_logprob(doc)    = round(avg ln p, 4)

    Self-contained (the model IS the corpus's own counts), so the
    DuckDB oracle reproduces scores exactly; no external model file.
    Returns (doc_id, n_tokens, mean_logprob).

    Plan shape at scale: positions come from ONE posexplode; the
    previous token is a lag window on the doc-keyed exchange (no
    self-join); unigram counts are a token-keyed agg broadcast onto the
    stream twice (once for tok, once for prev — web vocabs are
    dimension-sized after counting; ``broadcast_vocab=False`` turns
    both into uniform token-keyed shuffle joins); bigram counts join on
    the (prev, tok) pair key. Interpolation guarantees every observed
    token scores finite even for unseen bigrams.
    """
    toks = df.select(
        F.col("doc_id"),
        F.posexplode(
            tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.withColumn("prev", F.lag("token").over(w))

    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_uni"))
    total = uni.agg(F.sum("c_uni").alias("t"))
    uni = uni.join(F.broadcast(total)).select(
        "token", "c_uni", (F.col("c_uni") / F.col("t")).alias("p_uni")
    )
    bi = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )

    def _side(dim: DataFrame) -> DataFrame:
        return F.broadcast(dim) if broadcast_vocab else dim

    scored = (
        seq.join(_side(uni.select("token", "p_uni")), "token")
        .join(
            _side(
                uni.select(
                    F.col("token").alias("prev"), F.col("c_uni").alias("c_prev")
                )
            ),
            "prev",
            "left",
        )
        .join(_side(bi), ["prev", "token"], "left")
        .withColumn(
            "_lp",
            F.when(F.col("prev").isNull(), F.log(F.col("p_uni"))).otherwise(
                F.log(
                    F.lit(lam)
                    * (F.coalesce(F.col("c_bi"), F.lit(0)) / F.col("c_prev"))
                    + F.lit(1.0 - lam) * F.col("p_uni")
                )
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("_lp"), 4).alias("mean_logprob"),
    )


def trigram_backoff_logprob(
    df: DataFrame,
    text_col: str = "text",
    alpha: float = 0.4,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean log-score under a trigram stupid-backoff LM
    (Brants et al., EMNLP 2007 — the scheme built FOR web-scale MapReduce
    corpora: no discounting passes, just raw counts and a fixed backoff
    penalty, which is why it composes into plain keyed aggregates):

        S(w | u, v) = c(uvw)/c(uv)          if c(uvw) > 0
                    = alpha * S(w | v)       otherwise
        S(w | v)    = c(vw)/c(v)            if c(vw) > 0
                    = alpha * c(w)/T         otherwise
        S(w)        = c(w)/T

    Position 0 scores S(w), position 1 scores S(w|v) (no trigram
    context yet). Scores are NOT normalized probabilities (the 2007
    paper's point — ranking quality without normalization cost);
    mean ln S per doc, rounded to 4 dp. Self-contained like
    :func:`bigram_logprob` — the model is the corpus's own counts, so
    the DuckDB oracle replays scores exactly.

    Plan at 100 TB: ONE posexplode + two lag windows on the same
    doc-keyed exchange; unigram/bigram/trigram count tables are
    token-keyed aggregates with map-side combine, joined back
    broadcast (``broadcast_vocab=False`` for shuffle joins when the
    n-gram tables outgrow broadcast); the trigram CONTEXT count
    c(uv) is the bigram table reused under a (prev2, prev) key — no
    extra aggregate."""
    toks = df.select(
        F.col("doc_id"),
        F.posexplode(
            tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.withColumn("prev", F.lag("token", 1).over(w)).withColumn(
        "prev2", F.lag("token", 2).over(w)
    )

    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_uni"))
    total = uni.agg(F.sum("c_uni").alias("t"))
    uni = uni.join(F.broadcast(total)).select(
        "token", "c_uni", (F.col("c_uni") / F.col("t")).alias("p_uni")
    )
    bi = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    tri = (
        seq.filter(F.col("prev2").isNotNull())
        .groupBy("prev2", "prev", "token")
        .agg(F.count(F.lit(1)).alias("c_tri"))
    )

    def _side(dim: DataFrame) -> DataFrame:
        return F.broadcast(dim) if broadcast_vocab else dim

    scored = (
        seq.join(_side(uni.select("token", "p_uni")), "token")
        .join(
            _side(
                uni.select(
                    F.col("token").alias("prev"),
                    F.col("c_uni").alias("c_prev"),
                )
            ),
            "prev",
            "left",
        )
        .join(_side(bi), ["prev", "token"], "left")
        .join(
            _side(
                bi.select(
                    F.col("prev").alias("prev2"),
                    F.col("token").alias("prev"),
                    F.col("c_bi").alias("c_ctx"),
                )
            ),
            ["prev2", "prev"],
            "left",
        )
        .join(_side(tri), ["prev2", "prev", "token"], "left")
    )
    s_bi = F.when(
        F.col("c_bi").isNotNull(), F.col("c_bi") / F.col("c_prev")
    ).otherwise(F.lit(alpha) * F.col("p_uni"))
    s_tri = F.when(
        F.col("c_tri").isNotNull(), F.col("c_tri") / F.col("c_ctx")
    ).otherwise(F.lit(alpha) * s_bi)
    lp = (
        F.when(F.col("prev").isNull(), F.log(F.col("p_uni")))
        .when(F.col("prev2").isNull(), F.log(s_bi))
        .otherwise(F.log(s_tri))
    )
    return (
        scored.withColumn("_lp", lp)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("_lp"), 4).alias("mean_logprob"),
        )
    )


def token_distribution_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    buckets: int = 1024,
    smooth: float = 1.0,
) -> DataFrame:
    """Corpus drift monitor between two snapshots: hashed-unigram
    distributions of the OLD and NEW corpora over ``buckets`` md5
    feature buckets (same engine-portable hashing as DSIR), add-
    ``smooth`` smoothed, with each bucket's contribution to
    KL(new || old) = sum p_new ln(p_new / p_old). Monthly crawl
    pipelines run exactly this check before mixing a new snapshot in —
    a drift spike on a bucket range flags an extraction or source
    regression before it poisons the training mix.

    Returns one row per union bucket:
    (bucket, c_old, c_new, p_old, p_new, kl_term), probabilities and
    KL terms rounded to 6 dp (ln is the only non-rational step).

    Plan at 100 TB: each corpus reduces to <= ``buckets`` rows via ONE
    token-keyed count with map-side partials; the outer join runs over
    those two tiny aggregates. Nothing corpus-sized survives the
    counts.
    """
    from .sampling import hash_bucket

    def _buckets(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.explode(
                tokens(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("token")
        ).select(
            hash_bucket(F.col("token"), buckets).alias("bucket"),
            F.lit(tag).alias("_o"),
        )

    # ONE tagged-union count builds both distributions (same pivot move
    # as sampling.dsir_logweights: no per-side agg pair, no full-outer
    # join of the two count tables; the oracle keeps the textbook form)
    counts = (
        _buckets(old, 1)
        .unionByName(_buckets(new, 0))
        .groupBy("bucket")
        .agg(
            F.sum("_o").alias("c_old"),
            F.sum(F.lit(1) - F.col("_o")).alias("c_new"),
        )
    )
    totals = counts.agg(
        F.sum("c_old").alias("t_old"), F.sum("c_new").alias("t_new")
    )
    joined = counts.join(F.broadcast(totals))
    p_old = (F.col("c_old") + F.lit(smooth)) / (
        F.col("t_old") + F.lit(smooth * buckets)
    )
    p_new = (F.col("c_new") + F.lit(smooth)) / (
        F.col("t_new") + F.lit(smooth * buckets)
    )
    return joined.select(
        "bucket",
        F.col("c_old").cast("long").alias("c_old"),
        F.col("c_new").cast("long").alias("c_new"),
        F.round(p_old, 6).alias("p_old"),
        F.round(p_new, 6).alias("p_new"),
        F.round(p_new * F.log(p_new / p_old), 6).alias("kl_term"),
    )


def lang_id_margin(
    df: DataFrame, text_col: str = "text", min_margin: int = 2
) -> DataFrame:
    """Language-ID with a CONFIDENCE margin — the CCNet gate: keep a doc
    only when the top language's evidence beats the runner-up by at
    least ``min_margin`` stopword hits (ambiguous pages, code, and
    mixed-language boilerplate sit near zero margin and should not be
    routed into a monolingual training mix).

    Returns (doc_id, pred_lang, pred_hits, margin, confident) —
    ``pred_lang`` uses the exact :func:`lang_id` tie-break, ``margin``
    = top hits - second-best hits.

    Plan at 100 TB: pure per-row projection (four array_intersect
    counts + an array_sort of a 4-element array); zero shuffles."""
    t = F.col(text_col)
    toks = tokens(t)
    hits = [
        F.size(
            F.array_intersect(
                toks, F.array([F.lit(w) for w in STOPWORDS[lang]])
            )
        )
        for lang in sorted(STOPWORDS)
    ]
    arr = F.array_sort(F.array(*hits))
    top = F.element_at(arr, -1)
    second = F.element_at(arr, -2)
    return df.select(
        "doc_id",
        pred_lang_col(t).alias("pred_lang"),
        top.cast("long").alias("pred_hits"),
        (top - second).cast("long").alias("margin"),
        ((top - second) >= min_margin).alias("confident"),
    )


def readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease score per document (Flesch 1948) — the
    classic prose-difficulty signal a curation mix uses to balance
    simple vs dense text (e.g. routing kids'-encyclopedia-grade prose
    and legalese into different mixture buckets).

    score = 206.835 - 1.015 * (words/sentences) - 84.6 * (syllables/words)

    Counting grammar (pinned so the oracle replays it exactly):
    words = whitespace-separated tokens; sentences = maximal runs of
    ``.!?`` (min 1 so headline-only fragments don't divide by zero);
    syllables = vowel GROUPS ``[aeiouy]+`` in the lowercased text —
    the standard cheap proxy (true syllabification needs a dictionary;
    the vowel-group count is within ~10% on English prose and is
    deterministic in any regex dialect).

    Returns (doc_id, words, sentences, syllables, flesch, band) with
    band in {easy, standard, difficult} at the conventional 60/30
    cuts. Plan at 100 TB: pure per-row projection — three
    regexp_count expressions, zero shuffles.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    sentences = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    syllables = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    w = words.cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / w)
    )
    return df.filter(words > 0).select(
        "doc_id",
        words.cast("long").alias("words"),
        sentences.cast("long").alias("sentences"),
        syllables.cast("long").alias("syllables"),
        F.round(flesch, 6).alias("flesch"),
        F.when(flesch >= 60, F.lit("easy"))
        .when(flesch >= 30, F.lit("standard"))
        .otherwise(F.lit("difficult"))
        .alias("band"),
    )
