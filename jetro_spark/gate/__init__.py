"""Correctness-gate query registry.

Each gate module contributes ``QUERIES: dict[str, Callable[(spark, sf_dir)
-> DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the
driver's pre-registered views). ``__spark_entry__.py`` aggregates them.

Conventions (driver compare = row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column aliased IDENTICALLY in Spark and SQL;
- doubles rounded (2-4 dp) on BOTH sides so floating-point accumulation
  order can't flip the hash;
- DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT);
- timestamps never output raw — derive epoch longs / formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from jetro_spark.gate import (
        analytics,
        benchlock,
        hof,
        joins,
        jql,
        llm,
        profiling,
        ranking,
        relational,
        scalars,
        streaming,
        timeseries,
    )

    return (relational, joins, scalars, analytics, timeseries, profiling,
            jql, llm, ranking, hof, streaming, benchlock)


# The driver's correctness run samples the FIRST 50 registry rows; this
# tier lists one representative per operator family so the sample spans
# the whole surface (relational core, extended joins, scalars, windows,
# time series, profiling, JQL language, LLM-pipeline ops, HOFs,
# streaming, doc-suite) instead of exhausting itself on the first two
# modules. Every row still runs in the full local gate
# (scripts/check_oracle.py); tiering changes sampling coverage only.
_TIER1 = [
    # relational core
    "filter_map", "sort_take", "group_agg", "join3_revenue", "count_by",
    "index_by", "max_by", "pivot", "implode", "approx_count_distinct",
    # extended joins ("salted_join" rotated out in r10 for gram_overlap;
    # "range_join" rotated out in r11 for mm_resize — asof_join keeps
    # the non-equi join shape driver-visible and the join family keeps
    # four tier-1 reps; rotated-out rows still run in the full local
    # gate)
    "equi_join", "asof_join", "join_semi",
    # r14 rotation (verdict item 1): "bucketed_join" rotates out — the
    # join family keeps three tier-1 reps (equi/asof/semi) and
    # bucketed_join still runs in the full local gate.
    # scalar functions ("encoding" rotated out in r7 for simhash_pairs;
    # "parse_cast" rotated out in r8 for bm25_topk so the new ranking
    # family is driver-visible — the scalar family keeps two
    # representatives; every rotated-out row still runs in the full
    # local gate)
    "string_case", "regex_ops",
    # corpus-statistics ranking (r8)
    "bm25_topk",
    # window builtins ("win_zscore" rotated out in r14 — win_lag_lead
    # keeps the window family driver-visible)
    "win_lag_lead",
    # time series ("rollup_gapfill" rotated out in r9 for funnel_step;
    # "sessionize" rotated out in r10 for funnel_unordered;
    # "funnel_unordered" rotated out in r13 for semantic_keep —
    # funnel_step keeps the funnel family driver-visible)
    "time_bucket", "funnel_step",
    # profiling / contracts
    "group_quantiles", "profile_table", "check_constraints",
    # JQL language (doc + relational modes). r14 adds "path_ops" —
    # §2.8's only gate row (get/set/del/has_path, flatten/unflatten
    # keys), never driver-visible through r13.
    "jql_filter_map", "jql_patch", "jql_window", "jql_comprehension",
    "jql_variant_deep", "deep_search", "path_ops",
    # LLM-pipeline operators (r9 rotations: ann_topk → temp_mixture so
    # the sampling family gets a tier-1 rep — ann_ivf_trained already
    # embeds the brute-force recall baseline in-plan; label_centroids →
    # tfidf_embed; text_stats → pii_mask — quality_filters keeps the
    # text-stats style covered)
    # r12 rotation (verdict item 3): dedup_lines (C4 line rule) and
    # dedup_spans (Lee et al. exact-substring spans) — the two most
    # distinctive corpus-dedup operators — become driver-visible;
    # simhash_pairs rotates out (the dedup family keeps four reps:
    # exact, lsh, cluster, lines/spans) and pack_cumsum rotates out
    # (pipeline_demo exercises packing downstream). Rotated-out rows
    # still run in the full local gate.
    "dedup_exact", "dedup_lsh", "dedup_cluster", "dedup_lines",
    "dedup_spans",
    # r13 rotation (verdict item 1): semantic_dedup (SemDeDup pairs)
    # and semantic_keep (the retention row whose DuckDB unbounded-pairs
    # anti-select oracle PROVES the r12 byte-exact pre-collapse is
    # output-invariant) become driver-visible — the r12 headline scale
    # fix had no driver CORRECTNESS row. Rotated out: funnel_unordered
    # (funnel_step keeps the family) and mm_decode (mm_resize runs
    # decode downstream). Both still run in the full local gate.
    "semantic_dedup", "semantic_keep",
    "temp_mixture",
    # r10 rotation: gram_overlap (cross-source shared-n-gram counts)
    # joins the tier-1 text family alongside pii_mask/quality_filters
    # r14 rotation (verdict item 1): ann_pq (the recall-gated IVF-PQ —
    # the hardest similarity row) and ngram_lm (bigram-LM perplexity,
    # the ranking family's heaviest row) become driver-visible;
    # quality_filters rotates out (pii_mask/gram_overlap keep the text
    # family covered). All rotated-out rows still run in the full
    # local gate.
    "ann_ivf_trained", "ann_pq", "tfidf_embed", "ngram_lm", "pii_mask",
    "gram_overlap", "pipeline_demo",
    # r11 rotation: the two r10 operators become driver-visible —
    # mm_resize (aspect-preserving image resize plumbing, replaces
    # range_join) and quality_logit (hashed-feature linear quality
    # classifier, replaces doc_bl_q10 — doc_bl_q5 keeps the doc
    # bench-suite family covered)
    "mm_resize", "quality_logit",
    # HOFs / streaming / doc-suite. r14: "stream_state" (the
    # applyInPandasWithState leg) becomes driver-visible; "hof_stream"
    # rotates out (the jql_* rows keep HOF lowering covered).
    "win_tumbling", "stream_interval_join", "stream_state", "doc_bl_q5",
]


def _ordered(merged: dict) -> dict:
    head = {k: merged[k] for k in _TIER1 if k in merged}
    tail = {k: v for k, v in merged.items() if k not in head}
    return {**head, **tail}


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return _ordered(out)
