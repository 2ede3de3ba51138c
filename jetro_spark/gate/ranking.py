"""Gate rows for the r8 corpus-statistics operators: BM25 keyword
relevance, DSIR importance weights, PMI collocations (llm/ranking.py)
and Z-order layout keys (operators/layout.py).

Oracle style follows gate/llm.py: the single `ln` each method needs is
rounded to 6 dp at its narrowest grain (per term / bucket / bigram) on
BOTH sides, every other step is integer or structurally-mirrored double
arithmetic, and per-document sums go through DECIMAL(28,10) so
accumulation order can't flip the hash. Float literals in the SQL are
::DOUBLE-cast — DuckDB parses bare decimal literals as DECIMAL, which
would silently switch the arithmetic lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.llm import ranking as RK
from jetro_spark.operators.layout import zorder_key, zorder_key_sql
from jetro_spark.session import fan_out, load_tables

QUERIES: dict = {}
ORACLES: dict = {}


def _docs(spark: SparkSession, sf_dir: str, fan: bool = False) -> DataFrame:
    """``fan=True``: see gate/llm.py — restores scan parallelism on the
    single-row-group bench file for rows whose per-row compute (md5
    bucket folds, bigram builds) dominates (guide §2.5)."""
    d = load_tables(spark, sf_dir, register=False)["documents"]
    return fan_out(d) if fan else d


_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = f"list_filter(string_split_regex(trim({_NORM}), '\\s+'), x -> len(x) > 0)"


# ----------------------------------------------------------------- BM25

_BM25_TERMS = ["spark", "sort", "window", "merge", "fast"]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-25 for a fixed 5-term query. The oracle replays
    tf / df / dl / idf end-to-end in SQL; ties at the LIMIT boundary
    break on doc_id, so the kept set is deterministic."""
    return RK.bm25_scores(_docs(spark, sf_dir), _BM25_TERMS, top_k=25)


QUERIES["bm25_topk"] = q_bm25_topk

_TERMS_SQL = ", ".join(f"'{t}'" for t in sorted(_BM25_TERMS))
ORACLES["bm25_topk"] = f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), b2 AS (
      SELECT doc_id, len(t) AS dl,
             list_filter(t, x -> x IN ({_TERMS_SQL})) AS qt
      FROM base
    ), stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM b2
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(qt) AS term FROM b2
            WHERE len(qt) > 0)
      GROUP BY doc_id, dl, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.doc_id,
             (round(ln(1.0::DOUBLE + (n - df + 0.5::DOUBLE)
                       / (df + 0.5::DOUBLE)), 6)
              * (tf * 2.2::DOUBLE
                 / (tf + 1.2::DOUBLE
                    * (0.25::DOUBLE + 0.75::DOUBLE
                       * (CAST(dl AS DOUBLE) * n / sumdl))))
             )::DECIMAL(28,10) AS c
      FROM tf JOIN dfreq USING (term), stats
    )
    SELECT doc_id,
           round(CAST(sum(c) AS DOUBLE), 6) AS score,
           count(*) AS n_terms
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 25
"""


# ----------------------------------------------------------------- DSIR

_DSIR_B = 256
_DSIR_SEED = 7


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights with target = the English slice of the
    corpus. The Spark side embeds the 256-bucket log-ratio model as a
    literal map (zero-shuffle scoring); the oracle re-derives the same
    model with CTEs and joins — two independent routes to the same
    per-document sum."""
    d = _docs(spark, sf_dir, fan=True)
    return RK.dsir_weights(d, d.filter(F.col("lang") == "en"),
                           n_buckets=_DSIR_B, seed=_DSIR_SEED)


QUERIES["dsir_weights"] = q_dsir_weights


def _md5int(tag_sql: str, seed: int) -> str:
    """First-8-hex-chars(md5(tag:seed)) as an unsigned 32-bit BIGINT —
    digit-by-digit Horner decode (the gate/llm.py `_frac_of` trick
    without the final division)."""
    return f"""CAST(list_sum([(strpos('0123456789abcdef',
        substr(substr(md5({tag_sql} || ':{seed}'), 1, 8), i, 1)) - 1)
        * 16**(8-i) for i in generate_series(1, 8)]) AS BIGINT)"""


_GRAMS12 = ("list_concat(t, [t[i] || ' ' || t[i+1] "
            "for i in generate_series(1, greatest(len(t) - 1, 0))])")

ORACLES["dsir_weights"] = f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKS} AS t FROM documents
    ), gb AS (
      SELECT doc_id, lang,
             CAST({_md5int('g', _DSIR_SEED)} % {_DSIR_B} AS INT) AS bucket
      FROM (SELECT doc_id, lang, unnest({_GRAMS12}) AS g FROM toks)
    ), raw AS (
      SELECT bucket, count(*) AS rc FROM gb GROUP BY bucket
    ), tgt AS (
      SELECT bucket, count(*) AS tc FROM gb WHERE lang = 'en'
      GROUP BY bucket
    ), tot AS (
      SELECT (SELECT CAST(sum(rc) AS BIGINT) FROM raw) AS rt,
             (SELECT CAST(sum(tc) AS BIGINT) FROM tgt) AS tt
    ), ratios AS (
      SELECT b.bucket,
             round(ln(((coalesce(tc, 0) + 1.0::DOUBLE)
                       / (tt + 256.0::DOUBLE))
                      / ((coalesce(rc, 0) + 1.0::DOUBLE)
                         / (rt + 256.0::DOUBLE))), 6) AS lr
      FROM (SELECT unnest(generate_series(0, {_DSIR_B - 1})) AS bucket) b
      LEFT JOIN raw USING (bucket) LEFT JOIN tgt USING (bucket), tot
    ), scores AS (
      SELECT doc_id,
             round(CAST(sum(lr::DECIMAL(28,10)) AS DOUBLE), 6) AS w
      FROM gb JOIN ratios USING (bucket) GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(s.w, 0.0::DOUBLE) AS dsir_weight
    FROM documents d LEFT JOIN scores s USING (doc_id)
"""


# ------------------------------------------------------------------ PMI


def q_pmi_colloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent-pair collocations by PMI (pairs seen ≥ 5×).
    Counts are exact integers; pmi's ln is rounded per BIGRAM (the
    output grain), tie-broken (pmi desc, w1, w2)."""
    return RK.pmi_collocations(_docs(spark, sf_dir), min_count=5,
                               top_k=40)


QUERIES["pmi_colloc"] = q_pmi_colloc

ORACLES["pmi_colloc"] = f"""
    WITH toks AS (
      SELECT {_TOKS} AS t FROM documents
    ), uni AS (
      SELECT w, count(*) AS cw
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), bi AS (
      SELECT split_part(p, ' ', 1) AS w1, split_part(p, ' ', 2) AS w2,
             count(*) AS pair_count
      FROM (SELECT unnest([t[i] || ' ' || t[i+1]
                           for i in generate_series(1, greatest(len(t) - 1, 0))])
                   AS p
            FROM toks)
      GROUP BY 1, 2
    ), tot AS (
      -- one pass over toks, mirroring the Spark side: sum(cw) == sum
      -- of token counts, sum(pair_count) == sum of max(len-1, 0)
      SELECT CAST(sum(len(t)) AS BIGINT) AS tu,
             CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS tb
      FROM toks
    )
    SELECT w1, w2, pair_count,
           round(ln((pair_count / tb)
                    / ((u1.cw / tu) * (u2.cw / tu))), 6) AS pmi
    FROM bi
    JOIN uni u1 ON u1.w = bi.w1
    JOIN uni u2 ON u2.w = bi.w2, tot
    WHERE pair_count >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 40
"""


# -------------------------------------------------------------- Z-order

_Z_COLS_SQL = ["o_custkey % 1024", "o_orderkey % 1024"]


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton interleave of two 10-bit-quantized order dimensions —
    the clustering key zorder_layout range-partitions writes on. Pure
    integer bit arithmetic, so the oracle is the SAME closed form
    (operators/layout.py keeps the Column builder and the SQL spelling
    side-by-side so they cannot drift)."""
    o = load_tables(spark, sf_dir, register=False)["orders"]
    z = zorder_key([F.col("o_custkey") % 1024, F.col("o_orderkey") % 1024],
                   bits=10)
    return o.select("o_orderkey", z.alias("zkey"))


QUERIES["zorder_key"] = q_zorder_key

ORACLES["zorder_key"] = f"""
    SELECT o_orderkey,
           CAST({zorder_key_sql(_Z_COLS_SQL, bits=10)} AS BIGINT) AS zkey
    FROM orders
"""


# ------------------------------------------------------------ n-gram LM


def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram LM score per document (the CCNet/KenLM-style
    perplexity filter without an external model). The oracle retrains
    the same counts and replays the smoothed per-occurrence logprobs —
    ln rounded to 6 dp before the decimal-exact per-doc average."""
    return RK.ngram_lm_score(_docs(spark, sf_dir, fan=True), alpha=0.1)


QUERIES["ngram_lm"] = q_ngram_lm

ORACLES["ngram_lm"] = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), occ AS (
      SELECT doc_id, split_part(p, ' ', 1) AS w1,
             split_part(p, ' ', 2) AS w2
      FROM (SELECT doc_id,
                   unnest([t[i] || ' ' || t[i+1]
                           for i in generate_series(1, greatest(len(t) - 1, 0))])
                   AS p
            FROM toks)
    ), uni AS (
      SELECT w, count(*) AS c1
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), bic AS (
      SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY w1, w2
    ), v AS (
      SELECT count(*) AS v FROM uni
    ), sums AS (
      SELECT doc_id,
             CAST(sum(round(ln(
                 (coalesce(c12, 0) + 0.1::DOUBLE)
                 / (coalesce(c1, 0) + 0.1::DOUBLE * v)), 6)::DECIMAL(28,10))
               * 1000000 AS BIGINT) AS s6,
             count(*) AS c
      FROM occ
      LEFT JOIN bic USING (w1, w2)
      LEFT JOIN uni ON uni.w = occ.w1, v
      GROUP BY doc_id
    ), scored AS (
      -- round-half-away mean in INTEGER arithmetic (micros), mirroring
      -- the Spark side: float round() of sum/count lands exactly on
      -- 6-dp half boundaries and the engines' rounding diverges there
      SELECT doc_id,
             (((2 * abs(s6) + c) // (2 * c))
              * (CASE WHEN s6 < 0 THEN -1 ELSE 1 END)) / 1000000.0
               AS lm_score,
             c AS n_bigrams
      FROM sums
    )
    SELECT d.doc_id, s.lm_score,
           coalesce(s.n_bigrams, 0) AS n_bigrams
    FROM documents d LEFT JOIN scored s USING (doc_id)
"""


# ------------------------------------------- linear quality scorer (r10)

# deterministic literal weight vector shared by both sides:
# w[b] = ((b * 37) % 21 - 10) / 10  in [-1.0, 1.0]
_LS_DIM = 64
_LS_WEIGHTS = [((b * 37) % 21 - 10) / 10.0 for b in range(_LS_DIM)]

# md5-derived token bucket, the hashed_embedding convention
# (gate/llm.py _HE_BUCKET); seed 9, dim 64
_LS_BUCKET = """CAST(CAST(list_sum([(strpos('0123456789abcdef',
    substr(substr(md5(tok || ':9'), 1, 8), i, 1)) - 1)
    * 16**(8-i) for i in generate_series(1, 8)]) AS BIGINT) % 64 AS INT)"""


def q_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10: fastText-style hashed-feature linear quality scoring — the
    corpus-scale application of an offline-trained filter model. The
    weight vector is a plan literal (zero-shuffle scoring, the DSIR
    shape); dot decimal-accumulates; sigmoid rounds at 6 dp like every
    other transcendental in this module."""
    return RK.linear_score(_docs(spark, sf_dir, fan=True), _LS_WEIGHTS,
                           bias=-0.1)


QUERIES["quality_logit"] = q_quality_logit

ORACLES["quality_logit"] = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), tl AS (
      SELECT doc_id, {_LS_BUCKET} AS b
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
    ), tw AS (
      SELECT doc_id, b, round(ln(1.0::DOUBLE + count(*)), 6) AS w
      FROM tl GROUP BY doc_id, b
    ), lg AS (
      SELECT doc_id,
             CAST(sum((w * ((((b * 37) % 21 - 10) / 10.0::DOUBLE)))
                      ::DECIMAL(28,10)) AS DOUBLE) AS s
      FROM tw GROUP BY doc_id
    )
    SELECT d.doc_id,
           round(-0.1::DOUBLE + coalesce(lg.s, 0.0::DOUBLE), 8) AS logit,
           round(1.0::DOUBLE
                 / (1.0::DOUBLE
                    + exp(-round(-0.1::DOUBLE + coalesce(lg.s, 0.0::DOUBLE),
                                 8))), 6) AS score
    FROM documents d LEFT JOIN lg USING (doc_id)
"""
