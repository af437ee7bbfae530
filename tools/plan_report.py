"""Generate PLANS.md: physical-plan evidence for representative queries.

For each selected query this captures `df.explain("formatted")` at sf0.01
and extracts the scale-relevant evidence: parquet PushedFilters /
ReadSchema (pushdown + column pruning), join strategies (broadcast vs
shuffle), aggregate modes (partial/final = map-side combine), number of
Exchanges (shuffles) and WholeStageCodegen spans. The full formatted plan
is included for the headline queries so the evidence is auditable.

Usage: PYTHONPATH=/root/repo python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

EVIDENCE_PATTERNS = [
    ("PushedFilters", r"PushedFilters: \[[^\]]*\]"),
    ("ReadSchema", r"ReadSchema: \S+"),
    ("joins", r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)\b"),
    ("agg modes", r"HashAggregate \(|SortAggregate \(|partial_"),
    ("top-k", r"TakeOrderedAndProject"),
]

# (query, include full plan?, what the plan must show)
SELECTED = [
    ("tpch_q6_selective", True,
     "filters pushed into the parquet scan; ReadSchema pruned to the 4 "
     "referenced columns; partial+final aggregate (map-side combine)"),
    ("tpch_q5_region_revenue", True,
     "nation/region dims broadcast (no shuffle for small sides); the "
     "lineitem-orders-customer chain shuffles on join keys; one partial/"
     "final aggregate after the joins"),
    ("orders_per_nation", False,
     "broadcast dim join + two-phase count"),
    ("vocab_top20", False,
     "partial_count before the token Exchange (map-side combine on skewed "
     "tokens); TakeOrderedAndProject, never a global sort"),
    ("sample_hash_mod", False,
     "narrow map-side filter: zero Exchanges, scan reads only the "
     "projected columns"),
    ("window_running_count", False,
     "single Exchange on the window partition key, sort inside partition"),
    ("dedup_lsh_pairs", False,
     "signature agg shuffles once on doc_id with partial min; band "
     "self-join is keyed on (band_idx, band_key), never a cross join — at "
     "this tiny scale AQE correctly picks broadcast for the band table; at "
     "100 TB the same plan becomes a shuffled join on the band key"),
    ("route_counts", False,
     "parse+route is shuffle-free until the final counters aggregate"),
    ("tpch_q4_semijoin", False,
     "EXISTS compiles to a semi-join (no row duplication from the "
     "many-side); lineitem scan pruned to (l_orderkey, l_shipdate) with "
     "the date filter pushed down"),
    ("funnel_depth_counts", False,
     "three per-user conditional min-aggregates chained by inequality "
     "joins — each stage's output is one row per user, so join inputs "
     "shrink monotonically down the funnel"),
    ("curation_v2", False,
     "per-row gates (quality, repetition, Gopher, C4, PII) compose as "
     "column projections — zero doc_id join-backs; the optimized plan's "
     "only 2 joins live inside contamination (benchmark-shingle broadcast "
     "+ flags attach), and the corpus-wide shuffles are the paragraph-"
     "dedup digest window + exact-dedup window (asserted in "
     "test_plan_discipline.py::test_curation_gates_are_projections)"),
    ("dedup_lsh_verified", False,
     "HOF MinHash signatures are two shuffle-free projections; the band "
     "self-join is keyed on (band_idx, band_key); exact Jaccard runs "
     "only within LSH candidate pairs via array_intersect — never "
     "all-pairs"),
    ("multimodal_decode", False,
     "mapInPandas header decode sees only (media_id, payload, kind) — "
     "UDF-boundary column pruning keeps the binary column out of every "
     "other stage; zero Exchanges before the metadata projection"),
    ("ann_ivf_nprobe", False,
     "centroid assignment is an unrolled argmax expression (no join); "
     "query fan-out is query-side only (nprobe=2 duplicates the 10-row "
     "query set, not the corpus); one Exchange on the cell key"),
    ("asof_enrich_version", False,
     "as-of join via union + running window: NO join operator in the "
     "plan at all — one Exchange on the key for the window sort, one "
     "for the final aggregate; a range-join formulation would plan "
     "BroadcastNestedLoopJoin"),
    ("range_join_ip_blocks", False,
     "range predicate compiles to BroadcastHashJoin on the covering bin "
     "with the exact lo<=v<hi residual as join condition — the fact "
     "side never shuffles for the join; count(distinct) rewrites to "
     "two-phase expand+agg"),
    ("boilerplate_removal", False,
     "the distinct-doc count is a lag-flag + window sum on ONE "
     "(group, digest) Exchange — no groupBy+join-back; the only other "
     "corpus shuffle is the per-doc regroup"),
    ("repeated_ngram_removal", False,
     "grams built per row with HOFs (no shifted-copy self-join); "
     "distinct-doc count per gram is a lag-flag window sum on ONE "
     "digest Exchange; the n-fold covered-position explode happens "
     "only AFTER the >= min_docs filter; rebuild is a doc-keyed join"),
    ("chunk_documents", False,
     "pure per-row HOF expansion (sequence -> transform -> posexplode): "
     "ZERO corpus shuffles beyond the ingest repartition"),
    ("curation_v3", False,
     "round-3 gates (linear classifier score, dominant script, card-Luhn "
     "PII) composed as pure projections: ZERO joins; the only exchanges "
     "are the ingest repartition + the final groupBy(source)"),
    ("domain_quality", False,
     "domain-level quality gate: one per-domain agg exchange, then the "
     "bounded verdict table broadcasts back (BroadcastHashJoin) — no "
     "corpus-sized shuffle on the join"),
    ("semdedup", False,
     "centroid assignment is a broadcast of the (k<=16)-row centroid "
     "table onto the corpus (BroadcastHashJoin after the argmax "
     "projection); the cosine prune pairs only WITHIN a cluster — the "
     "self-join is keyed on cluster_id, never all-pairs"),
    ("cross_snapshot_dedup", False,
     "both anti-joins (exact md5, MinHash band keys) are keyed "
     "equi-joins against the previous snapshot's key sets — the new "
     "crawl shuffles once per key space, the old snapshot is reduced to "
     "its keys before joining; no all-pairs comparison anywhere"),
    ("host_frequency_cap", False,
     "one exchange on the host key + window rank; the content-addressed "
     "(md5(id), id) pick needs no second pass and output is <= k rows "
     "per host regardless of skew"),
    ("perplexity_buckets", False,
     "the corpus-unigram LM score reuses unigram_logprob's ONE "
     "token-keyed count + broadcast score join; the per-group ntile is "
     "one exchange on the group key"),
    ("dsir_select", False,
     "both corpora reduce to <= buckets rows via token-keyed counts "
     "(map-side partials); the lambda table is broadcast onto the "
     "exploded raw tokens (zero fact-side join shuffle); top-k is "
     "TakeOrderedAndProject, never a global sort"),
    ("token_entropy", False,
     "two keyed partial-agg shuffles — (doc_id, token) count then "
     "per-doc agg via the ln(n) - sum(c ln c)/n identity; no window, "
     "no within-row O(distinct x n) scan"),
    ("keep_best_duplicate", False,
     "ONE hash aggregate on the md5 fingerprint — the argmax is a "
     "struct-min with MAP-SIDE partial combine (no sort/window "
     "touches the hot fingerprint); output one row per distinct "
     "content"),
    ("cross_snapshot_bloom", False,
     "the Bloom bitmap is a broadcast LITERAL array probed with "
     "element_at + bitwise AND inside codegen — bloom-absent rows never "
     "reach the anti-join; only the maybe-duplicate residue shuffles "
     "into the exact confirm join"),
    ("bigram_logprob", False,
     "positions from ONE posexplode; previous token via a lag window on "
     "the doc-keyed exchange (no self-join); unigram/bigram count "
     "tables broadcast back onto the stream"),
    ("snapshot_drift", False,
     "each corpus reduces to <= buckets rows via one token-keyed count "
     "with map-side partials; the KL outer join runs over those two "
     "tiny aggregates — nothing corpus-sized survives the counts"),
    ("robots_meta", False,
     "pure per-row projection: decode + lowercase + three RE2-safe "
     "regexp_extracts, zero shuffles beyond the ingest repartition"),
    ("main_content", False,
     "block split + per-block link-density scoring + keep filter are "
     "one per-row HOF chain — zero shuffles beyond the ingest "
     "repartition"),
    ("near_dup_keep_best", False,
     "the canonical pick adds ONE cluster_id hash aggregate (struct-"
     "min argmax, map-side partials, no window) on top of the banded-"
     "join + components chain; never all-pairs"),
    ("shard_checksums", False,
     "one keyed exchange with map-side partial bit_xor; output is "
     "n_shards rows regardless of corpus size"),
    ("pack_manifest", False,
     "one (shard, pack_id) exchange; per-pack collect_list is "
     "budget-bounded by construction; offsets are a per-row HOF fold"),
    ("lang_id_margin", False,
     "pure per-row projection: four array_intersect counts + a "
     "4-element array_sort; zero shuffles"),
    ("warc_scan", False,
     "byte-accurate Content-Length framing is ONE Arrow-batched "
     "mapInPandas over binaryFile rows (the documented imperative-UDF "
     "exception); everything downstream is columnar"),
    ("robots_gate", False,
     "rule parse = two window passes on ONE host-keyed exchange; the "
     "URL gate joins on host and resolves longest-match via a struct "
     "max — no window sort on the crawl side"),
    ("pagerank_hosts", False,
     "per round: one edge shuffle (src join) + one keyed agg (dst sum); "
     "node/degree tables dimension-sized; per-round localCheckpoint "
     "keeps lineage flat (24.7 s -> 3.4 s measured on hits before/after)"),
    ("semdedup_join", False,
     "production-k assignment path: the centroid fan-out is an "
     "INTENTIONAL BroadcastNestedLoopJoin of a k-row table (every "
     "vector scores every centroid by contract), then the argmax is "
     "ONE id-keyed aggregate with map-side partial combine — the only "
     "corpus exchange in the assignment; the downstream within-cell "
     "self-join stays a cell-keyed EQUI-join (SortMergeJoin here, "
     "shuffle-hash under AQE at scale — either is key-partitioned, "
     "never all-pairs)"),
    ("robots_gate_wildcards", False,
     "RFC 9309 wildcard rules ride the SAME host equi-join + struct-max "
     "plan as the literal robots_gate: the regex translation is a "
     "row-level projection and the wildcard match a `when` branch — "
     "zero extra exchanges for full-grammar compliance"),
    ("robots_crawl_delay", False,
     "group attribution is two window passes on ONE host-keyed "
     "exchange; the group semi-join and the final min() reuse the same "
     "(host) key — no second corpus shuffle"),
    ("block_dedup", False,
     "cross-doc ExactSubstr approximation: ONE exchange on the block "
     "digest (global min-owner window), then the doc-keyed regroup — "
     "two shuffles total, zero joins, token volume divided by the "
     "block size before the first exchange"),
    ("fetch_schedule", False,
     "one host-keyed window for the position + a BROADCAST join "
     "against the dimension-sized crawl-delay table; no other "
     "exchange"),
    ("winnow_fingerprint", False,
     "rolling-hash winnowing is a pure per-row expression chain "
     "(md5 token codes -> polynomial k-grams -> window minima), each "
     "stage its own projection so the md5 subtree evaluates once per "
     "row; the only exchange is the final distinct"),
    ("winnow_overlap", False,
     "overlap pairs come from an inverted-index equi-join on the "
     "fingerprint hash with a document-frequency cap pre-filter — "
     "shuffle on fp, never an all-pairs cross join"),
    ("surt_key", False,
     "SURT canonicalization is a pure whole-stage-codegen expression "
     "chain (regexp split + array reverse/sort + concat) — the only "
     "exchange is the test harness's round-robin repartition of the "
     "single-split table, which disappears at scale"),
    ("cdxj_scan", False,
     "the index parse is one projection: regexp field split + "
     "get_json_object, all JVM-side, zero Python, zero shuffles "
     "beyond the harness repartition; at 100 TB the CDX index "
     "arrives as many line-scan splits and parallelizes freely"),
    ("bm25_topic", False,
     "BM25 with a literal query: per-term tf is a within-row array "
     "HOF (no explode, no (doc,token) shuffle); corpus stats are ONE "
     "single-row aggregate broadcast back via a 1-row cross join — "
     "the plan must show BroadcastExchange, not a data-sized "
     "Exchange, between the stats and scoring stages"),
    ("change_rate", False,
     "the lag window and the per-url aggregate share ONE url-keyed "
     "exchange (Catalyst reuses the partitioning); per-url history "
     "depth is the snapshot count, so the window partition is bounded"),
    ("rrf_hybrid", False,
     "both ranker legs are k-bounded before fusion (TakeOrdered for "
     "BM25, per-query top-k window for cosine); the fusion itself is "
     "a union of tiny frames + one id-keyed groupBy — corpus-sized "
     "work stays in the rankers"),
    ("anchor_stats", False,
     "one (target, anchor) pre-aggregation with map-side combine, a "
     "target-keyed window argmax, and a target-keyed count/distinct — "
     "the final join's both sides already hash-partitioned by target"),
    ("recrawl_priority", False,
     "change-rate side is the url-keyed window+agg chain; the rank "
     "side is 20 rows and must appear as a BROADCAST join, never a "
     "shuffle of the rates table"),
    ("registrable_domain", False,
     "PSL longest-match is a pure expression chain — the suffix set "
     "folds into the plan as an array literal; zero exchanges beyond "
     "the harness repartition"),
    ("threshold_sweep", False,
     "the sweep is ONE aggregate of 4 x |thresholds| conditional "
     "sums (map-side partial combine -> single-row reduce) unpivoted "
     "by an in-plan literal struct array — never the |df| x "
     "|thresholds| cross join"),
    ("sitemap_entries", False,
     "block split + child-tag extraction inside one posexplode — a "
     "pure per-row projection, zero shuffles beyond the harness "
     "repartition"),
    ("warc_to_wet", False,
     "the conversion is a pure projection over the Arrow-framed "
     "records: the only Python is the one mapInPandas framing pass; "
     "tag-strip and entity decode are JVM-side regexp chains"),
    ("dup_profile", False,
     "one digest-keyed count with map-side combine collapsed by a "
     "single-row aggregate, cross-joined with the 1-row doc count "
     "(the repo's standard 1-row-broadcast scalar pattern)"),
    ("degree_histogram", False,
     "two node-keyed degree counts (map-side combine) + tiny bin "
     "groupBys; no per-node rows survive past the degree tables"),
    ("host_profile", False,
     "ONE (host, lang) pre-aggregation shrinks the corpus before the "
     "host-keyed rollup, window argmax and join — no second corpus "
     "exchange"),
    ("mixture_plan", False,
     "dimension-sized full-outer domain join + the 1-row broadcast "
     "weight normalizer (the standard scalar pattern)"),
    ("label_prop_hosts", False,
     "per-round neighbor-label equi-join + two node-keyed aggregates; "
     "rounds are lineage-cut (localCheckpoint), so the final plan reads "
     "from the checkpointed node table — no exponential re-expansion"),
    ("redirect_chains", False,
     "unrolled LEFT equi-joins against the edge-sized redirect map — "
     "broadcastable; one fixed-depth lazy plan, no iteration state"),
    ("url_templates", False,
     "one projection + ONE (host, template)-keyed aggregate with "
     "map-side combine; distinct via the standard two-phase expand"),
    ("snapshot_diff", False,
     "two URL-keyed pre-aggregations + one full-outer sort-merge join "
     "on the already-partitioned key"),
    ("centroid_drift", False,
     "posexplode -> (group, dim)-keyed partial+final aggregate (the "
     "shuffle carries groups x dim rows, not the corpus) + a group-keyed "
     "join of dimension-sized centroid tables; pairwise math is "
     "within-row HOFs"),
    ("image_dhash_dedup", False,
     "banded pigeonhole equi-join on (band_idx, band_val) — NEVER an "
     "all-pairs product; hamming verify is expression-only bit_count; "
     "the only Python is the Arrow-batched grid decode"),
    ("containment_dedup", False,
     "inverted shingle index self-join on the shingle key (same plan "
     "shape as ngram_jaccard) — shuffle on shingle, never all-pairs"),
    ("rate_limit_batch", False,
     "ONE host-keyed exchange into the Arrow-batched greedy scan "
     "(FlatMapGroupsInPandas — the documented sequential-per-group "
     "exception); per-group work bounded by the host's frontier-shard "
     "request count; the request projection before the gate is "
     "shuffle-free"),
    ("http_status_route", False,
     "HTTP header typing rides the SAME single Arrow framing pass as "
     "warc_scan (one mapInPandas, no second Python stage); the "
     "status-class routing key and the per-sink aggregate are pure "
     "expressions with partial+final combine on the (class, type, "
     "charset) key"),
    ("trustrank_spam", False,
     "biased-teleport rounds reuse pagerank's shape — one edge shuffle "
     "+ one keyed agg per round over node-sized tables, lineage-cut "
     "per round — plus a node-sized seed semi-join up front; spam "
     "mass is one join of two node-sized rank tables"),
    ("link_reciprocity", False,
     "edge distinct + ONE (src,dst)-keyed semi-join against the "
     "swapped edge list + two src-keyed counts with map-side combine; "
     "output node-sized"),
    ("trigram_backoff", False,
     "ONE posexplode + two lag windows share the doc-keyed exchange; "
     "uni/bi/tri count tables broadcast back onto the stream; the "
     "bigram table is REUSED as the trigram context count — no fourth "
     "aggregate"),
    ("weighted_sample", False,
     "the exp-sort key is a pure projection (md5 -> -ln(u)/w); "
     "per-stratum selection is one stratum-keyed exchange + bounded "
     "window rank (the global variant plans TakeOrderedAndProject, "
     "never a full sort)"),
    ("page_meta", False,
     "pure per-row projection: one decode + five RE2-safe "
     "regexp_extracts + the soft-404 rlike — zero shuffles beyond the "
     "harness repartition"),
    ("triangle_counts", False,
     "wedge join keyed on the shared corner and closed against (a,c) "
     "— equi-joins only, never an all-pairs product; per-node counts "
     "from a 3-corner explode with map-side combine"),
    ("bot_signals", False,
     "ONE host-keyed aggregate after the decode: counts + UA flag are "
     "map-side partials, exact distinct rewrites to two-phase "
     "expand+agg on the same key; flag/score projection is pure "
     "codegen after the agg"),
    ("sitemap_tree", False,
     "root classification is one rlike pair and locs one "
     "regexp_extract_all + posexplode — pure per-row projection, zero "
     "shuffles beyond the harness repartition"),
    ("meta_refresh", False,
     "pure per-row projection (decode + two RE2-safe two-group "
     "regexp_extracts + try_cast); zero shuffles beyond the harness "
     "repartition"),
    ("build_postings", False,
     "ONE (token, doc)-keyed count with map-side combine, shared by "
     "two token-keyed branches: the df count, and a rank filter that "
     "compiles to WindowGroupLimit with a PARTIAL pass before the "
     "exchange — a stopword's corpus-sized posting list is "
     "top-k-truncated map-side, never fully sorted in one reducer; "
     "final join is token-keyed on both pre-partitioned sides"),
    ("key_skew", False,
     "one key-keyed count (the partial agg collapses the hot key "
     "map-side — the diagnosis never suffers the disease it measures), "
     "a 1-row totals broadcast (intentional scalar BNLJ), and "
     "TakeOrderedAndProject for the top-k — never a global window "
     "over the key table"),
    ("ndcg_eval", False,
     "ONE query-keyed exchange shared by both window ranks (same "
     "partition key -> Catalyst reuses the sort) and the per-query "
     "aggregate; candidate lists are ranker-bounded upstream"),
    ("zscore_spikes", False,
     "ONE (key, bucket) count with map-side combine + ONE key-keyed "
     "moment aggregate over the bucket-count table; moments from exact "
     "integer sums — nothing corpus-sized past the first count"),
    ("canonical_pick", False,
     "ONE hash aggregate on the canonical key — struct-min argmax "
     "with map-side partial combine, so a hot canonical collapses per "
     "map task instead of sorting in one reducer; output one row per "
     "cluster"),
    ("hreflang_clusters", False,
     "pure per-row projection: two regexp_extract_all pairs zipped + "
     "one explode; zero shuffles beyond the harness repartition"),
    ("search_terms", False,
     "extraction is a pure projection after the decode; the report is "
     "ONE (engine, term) keyed count whose partial agg collapses hot "
     "terms map-side"),
    ("latency_percentiles", False,
     "ONE key exchange; exact percentile is the oracle pin — the "
     "exact=False approx_percentile path is the 100-TB shape (mergeable "
     "sketch, map-side partials, bounded state)"),
    ("error_wilson", False,
     "ONE hash aggregate (two conditional counts) with map-side "
     "combine; the interval is closed-form arithmetic after the agg"),
    ("slo_burn_alerts", False,
     "one bucket-keyed aggregate over the raw stream; the slow window "
     "re-aggregates the TINY fast-bucket table and joins back "
     "broadcast — never a second raw scan"),
    ("session_transitions", False,
     "one user-key exchange for the lag window, then one (prev, page) "
     "count whose partials collapse the small pair space map-side"),
    ("retention_cohorts", False,
     "one raw-input pass (distinct user/day); cohort is a re-aggregate "
     "joined back on the SAME user key; final count over the small "
     "(cohort, offset) space"),
    ("rendezvous_shards", False,
     "per-row constant expression (n md5 digests + argmax) into ONE "
     "shard-keyed aggregate; zero joins"),
    ("cms_accuracy", False,
     "grid build is one (row, bucket) aggregate whose map-side partial "
     "is bounded at d*w rows per task regardless of skew; probes are "
     "BroadcastHashJoins against the constant-size grid"),
    ("active_users_rolling", False,
     "one raw pass to distinct (user, day); the 7-day fan-out is a "
     "per-row explode (constant factor) deduped on (user, window-end) — "
     "never a per-day self-join over the week"),
    ("kcore_hosts", False,
     "per round ONE degree aggregate + two semi-joins against the "
     "shrinking survivor set (broadcast at this scale); no window, no "
     "cartesian anywhere in the peel"),
    ("last_touch", False,
     "one user-key exchange for the last_value(ignorenulls) window, "
     "then one campaign count over conversions only"),
    ("ua_breakdown", False,
     "classification is a pure first-match-wins projection after the "
     "decode; ONE triple-keyed count over a bounded key space"),
    ("epoch_shuffle", True,
     "r05: the zipWithIndex shape — NO WindowExec anywhere (the r04 "
     "partition-less row_number is gone); deterministic md5-prefix "
     "buckets make both passes pure recomputation (nothing pinned or "
     "checkpointed); the visible plan is MapInPandas over ONE "
     "bucket-range exchange; the <=16P-row bucket-count collect ran "
     "eagerly at build (the RDD.zipWithIndex contract)"),
    ("hll_distinct", False,
     "register build is ONE (group, bucket) aggregate with map-side "
     "partials bounded at m rows per group per task; estimate + exact "
     "join on the tiny group table"),
    ("latency_percentiles_kll", False,
     "the 100-TB percentile shape under oracle gate: approx_percentile "
     "is a mergeable bounded-state sketch — ONE key exchange with "
     "partial aggregation (objHashAggregate partial_/final_ modes), "
     "never a per-group value list"),
]


def evidence(plan: str) -> list[str]:
    out: list[str] = []
    seen = set()
    for label, pat in EVIDENCE_PATTERNS:
        for m in re.finditer(pat, plan):
            line = m.group(0)
            key = (label, line)
            if key not in seen:
                seen.add(key)
                out.append(f"{label}: {line}" if not line.startswith(label) else line)
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_wsc = len(re.findall(r"WholeStageCodegen", plan))
    out.append(f"Exchanges (shuffles): {n_ex}; WholeStageCodegen spans: {n_wsc}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from access_log_parser_spark import get_spark

    spark = get_spark(app_name="plans", master="local[4]", shuffle_partitions=8)
    qs = entry.queries()
    sections = []
    for name, full, claim in SELECTED:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        ev = "\n".join(f"- `{line}`" for line in evidence(plan))
        sec = f"## {name}\n\n**Claim:** {claim}\n\n**Evidence:**\n\n{ev}\n"
        if full:
            sec += f"\n<details><summary>full formatted plan</summary>\n\n```\n{plan.strip()}\n```\n\n</details>\n"
        sections.append(sec)
    spark.stop()

    header = (
        "# PLANS — physical-plan evidence (generated by tools/plan_report.py)\n\n"
        "`.explain(\"formatted\")` captures at sf0.01, local[4]. Each section\n"
        "states the plan property the operator is designed around at 100 TB\n"
        "scale and quotes the plan lines that prove it. Regenerate with\n"
        "`PYTHONPATH=/root/repo python tools/plan_report.py`.\n\n"
    )
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(header + "\n".join(sections))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
