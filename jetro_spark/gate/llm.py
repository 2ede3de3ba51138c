"""Gate queries: LLM-data-pipeline operators over documents/embeddings.

The dedup_lsh row is the load-bearing one: the banded MinHash-LSH
pipeline (no all-pairs join) must reproduce EXACTLY the pairs a
brute-force all-pairs exact-Jaccard scan finds in DuckDB — with b=32
bands of r=4, P(missing a 0.8-jaccard pair) ≈ 5e-8, so candidate
generation is effectively lossless and the equality is a real test of
the whole shingle→minhash→band→bucket-join→verify chain.

ann_topk likewise: the Spark broadcast-NLJ brute-force cosine ranking
must equal DuckDB's all-pairs ranking (dot products are sequential
double folds on both sides → identical IEEE results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.llm import dedup as D
from jetro_spark.llm import similarity as SIM
from jetro_spark.llm import text as TX
from jetro_spark.session import load_tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, register=False)["documents"]


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_ish_count(t).alias("n_bpe"),
        TX.alpha_ratio(t).alias("alpha"),
        TX.mean_word_len(t).alias("mwl"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.lang_hits(t, "en").alias("en_hits"),
        TX.lang_hits(t, "de").alias("de_hits"),
        TX.lang_hits(t, "fr").alias("fr_hits"),
        TX.lang_id(t).alias("pred"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    kept = D.exact_dedup(d, "text", order="doc_id")
    return kept.agg(
        F.count(F.lit(1)).alias("n_after"),
        F.countDistinct(TX.normalize_text(F.col("text"))).alias("n_norm"),
    )


def q_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return D.minhash_lsh_pairs(d, "doc_id", "text", k=5, threshold=0.8)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, register=False)["embeddings"]
    queries = e.filter(F.col("vec_id") < 10)
    out = SIM.brute_force_topk(e, queries, k=5)
    # score excluded: rank is float-robust, raw cosine doubles may differ
    # in the last ulp between engines' summation strategies
    return out.select("qid", "nid", "rank")


QUERIES = {
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "dedup_exact": q_dedup_exact,
    "dedup_lsh": q_dedup_lsh,
    "ann_topk": q_ann_topk,
}

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = f"list_filter(string_split_regex(trim({_NORM}), '\\s+'), x -> len(x) > 0)"


def _in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


ORACLES = {
    "text_stats": """
        SELECT doc_id,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> len(x) > 0))::BIGINT AS n_tokens,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe,
               1.0 - len(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                     / len(lower(text)) AS alpha,
               list_sum(list_transform(
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> len(x) > 0), x -> len(x)))::DOUBLE
                 / len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> len(x) > 0)) AS mwl
        FROM documents
    """,
    "lang_id": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), h AS (
          SELECT doc_id,
                 len(list_filter(toks, x -> x IN ({_in_list(TX.LANG_MARKERS['en'])})))::BIGINT AS en_hits,
                 len(list_filter(toks, x -> x IN ({_in_list(TX.LANG_MARKERS['de'])})))::BIGINT AS de_hits,
                 len(list_filter(toks, x -> x IN ({_in_list(TX.LANG_MARKERS['fr'])})))::BIGINT AS fr_hits
          FROM t
        )
        SELECT doc_id, en_hits, de_hits, fr_hits,
               CASE WHEN greatest(en_hits, de_hits, fr_hits) = 0 THEN 'und'
                    WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                    WHEN de_hits >= fr_hits THEN 'de'
                    ELSE 'fr' END AS pred
        FROM h
    """,
    "dedup_exact": f"""
        SELECT count(*) AS n_after,
               count(DISTINCT {_NORM}) AS n_norm
        FROM (SELECT DISTINCT ON ({_NORM}) text FROM documents ORDER BY {_NORM}, doc_id)
    """,
    "dedup_lsh": f"""
        WITH d AS (
          SELECT doc_id, {_NORM} AS t FROM documents
        ), s AS (
          SELECT doc_id,
                 list_distinct([substr(t, i, 5)
                                for i in generate_series(1, greatest(len(t)-4, 0))]) AS sh
          FROM d
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    """,
    "ann_topk": """
        WITH pairs AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
                 list_sum([q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
                           for i in generate_series(1, len(q.embedding))])
                 / (sqrt(list_sum([q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE
                                   for i in generate_series(1, len(q.embedding))]))
                    * sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
                                     for i in generate_series(1, len(c.embedding))])))
                 AS score
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 10 AND q.vec_id != c.vec_id
        ), ranked AS (
          SELECT qid, nid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, nid ASC) AS rank
          FROM pairs
        )
        SELECT qid, nid, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
}
