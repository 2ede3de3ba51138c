"""Corpus-statistics ranking & data-selection operators for
training-data pipelines: BM25 keyword relevance, DSIR importance
weights (hashed n-gram log-likelihood ratios, arXiv:2302.03169), and
PMI collocation mining.

Everything is pure `pyspark.sql.functions` — no Python UDFs — and every
transcendental (the one `ln` each method needs) is rounded to a fixed
grid at its NARROWEST point (one value per term / bucket / bigram, not
per row), so the downstream arithmetic is identical-double across
engines and the DuckDB oracle can hash-compare results exactly.

Scale shape (100 TB):
- BM25: tokens are filtered to the query-term set ROW-LOCALLY before
  anything shuffles, so the only corpus-wide exchange carries matching
  postings (|docs-with-a-hit| × |terms| rows, not tokens). Document
  frequencies and corpus stats are term-count/1-row tables joined back
  with `F.broadcast`.
- DSIR: pass 1 reduces the corpus to `n_buckets` hashed-gram counts
  (map-side combine → ≤B rows); the per-bucket log-ratio table is
  metadata-sized and embedded as a literal map (declared SCALE.md
  collect exception, like the ANN centroid models), so pass 2 scores
  every document with ZERO shuffle — a narrow projection at scan speed.
- PMI: two groupBy reductions to vocab-sized count tables; the
  per-bigram join back to unigram counts broadcasts the (tiny) unigram
  side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jetro_spark.functions.arrays import let_
from jetro_spark.llm.sampling import hash_bucket
from jetro_spark.llm.text import normalize_text, ws_tokens

_DEC = "decimal(28,10)"


def _toks(text_col: str) -> Column:
    return ws_tokens(normalize_text(F.col(text_col)))


# ------------------------------------------------------------------ BM25


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms
    (Robertson/Sparck-Jones idf, the `ln(1 + (N-df+.5)/(df+.5))`
    non-negative variant).

    Determinism contract: idf (the only transcendental) is rounded to
    6 dp per TERM; tf normalization is pure rational arithmetic over
    (tf, dl, N, Σdl) evaluated in the same structural order as the SQL
    oracle; per-term contributions are cut to DECIMAL(28,10) before the
    per-document sum, so accumulation order cannot flip the hash.

    Plan: tokens → row-local filter to `query_terms` (non-matching docs
    drop before the exchange) → ONE groupBy (doc, term) for tf → df by
    a groupBy over that (≤|terms| rows, broadcast back) → corpus stats
    (1 row, broadcast on a literal key) → scored sum per doc.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    did = F.col(id_col)

    base = docs.select(
        did,
        let_(_toks(text_col),
             lambda tk: F.struct(
                 F.size(tk).alias("dl"),
                 F.filter(tk, lambda t: t.isin(*terms)).alias("qt"),
             )).alias("__s"))
    base = base.select(did, F.col("__s.dl").alias("__dl"),
                       F.col("__s.qt").alias("__qt"))
    # ONE corpus tokenize pass (r14, the tfidf shared-exchange shape):
    # tf and the corpus-stats aggregate each consumed `base`, and plan
    # subtrees are never shared — the stats branch re-ran the whole
    # scan+tokenize chain. Repartitioning the REDUCED doc-level rows
    # (id, dl, query-term matches only — a few ints + a tiny array per
    # doc, never the text) by id gives both consumers one reusable
    # exchange; hashpartitioning(id) satisfies the (id, dl, term)
    # grouping, so tf needs no second exchange on top.
    base = base.repartition(did)

    # tf: NO pre-filter on size(__qt) — explode already emits nothing
    # for empty/null arrays, and the filter was WORSE than redundant:
    # pushed below the tokenize projection it re-evaluated the whole
    # tokenize expression per conjunct (r14 plan audit: 3 tokenize
    # evals per doc row in the tf branch, now 1)
    tf = (base.select(did, "__dl", F.explode("__qt").alias("term"))
          .groupBy(id_col, "__dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))

    if len(terms) <= 64:
        # document frequencies ride the corpus-stats aggregate as one
        # count_if column per term (bounded: |terms| <= 64), so the df
        # table needs NO second corpus pass — plan subtrees are never
        # shared, and the old dfreq = tf.groupBy(term) re-ran the whole
        # scan+tokenize+explode+groupBy chain (r14: 3 corpus passes →
        # 2). df per posting resolves from a literal map over the
        # one-row broadcast. df equivalence: a doc counts for term t
        # iff __qt contains t iff the doc has a tf row for t.
        stats = (base.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__dl").alias("__sumdl"),
            *[F.sum(F.array_contains("__qt", t).cast("int"))
              .alias(f"__df_{i}") for i, t in enumerate(terms)])
            .withColumn("__k", F.lit(1)))
        j = (tf.withColumn("__k", F.lit(1))
             .join(F.broadcast(stats), "__k")
             .withColumn("df", F.element_at(
                 F.map_from_arrays(
                     F.array(*[F.lit(t) for t in terms]),
                     F.array(*[F.col(f"__df_{i}")
                               for i in range(len(terms))])),
                 F.col("term"))))
    else:
        # wide term sets: per-term aggregate columns would bloat the
        # one-row frame and its codegen; keep the broadcast df join
        stats = (base.agg(F.count(F.lit(1)).alias("__n"),
                          F.sum("__dl").alias("__sumdl"))
                 .withColumn("__k", F.lit(1)))
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        j = (tf.join(F.broadcast(dfreq), "term")
             .withColumn("__k", F.lit(1))
             .join(F.broadcast(stats), "__k"))

    # idf: the lone ln, rounded at the per-term grain
    idf = F.round(
        F.log(1.0 + (F.col("__n") - F.col("df") + 0.5)
              / (F.col("df") + 0.5)), 6)
    # rational tf normalization — structure mirrored verbatim in SQL
    tfn = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * (F.col("__dl").cast("double")
                                           * F.col("__n") / F.col("__sumdl"))))
    out = (j.withColumn("__c", (idf * tfn).cast(_DEC))
           .groupBy(id_col)
           .agg(F.round(F.sum("__c").cast("double"), 6).alias("score"),
                F.count(F.lit(1)).alias("n_terms")))
    if top_k is not None:
        out = out.orderBy(F.desc("score"), F.asc(id_col)).limit(top_k)
    return out


# ------------------------------------------------------------------ DSIR


def hashed_grams(text_col: str | Column) -> Column:
    """Unigram + bigram surface forms of the normalized token stream
    (the hashed-n-gram feature space of DSIR, arXiv:2302.03169 §3)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return let_(
        ws_tokens(normalize_text(c)),
        lambda tk: F.concat(
            tk,
            F.zip_with(F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                       F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                       lambda a, bb: F.concat_ws(" ", a, bb))))


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_buckets: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Occurrence counts of hashed grams per bucket: ``(bucket, cnt)``,
    ≤ n_buckets rows (map-side combine does the heavy reduction)."""
    return (docs
            .select(F.explode(hashed_grams(text_col)).alias("g"))
            .select((hash_bucket(F.col("g"), seed) % n_buckets)
                    .cast("int").alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    *,
    n_buckets: int = 256,
    seed: int = 7,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-ratio ``ln(p_target / p_raw)`` with
    additive (Laplace) smoothing, one row per bucket in [0, n_buckets).
    Rounded to 6 dp — the per-bucket grain is where the transcendental
    is cut, so document scores are exact decimal sums of these."""
    spark = raw.sparkSession
    frame = spark.range(n_buckets).select(F.col("id").cast("int")
                                          .alias("bucket"))
    rc = bucket_counts(raw, text_col, n_buckets=n_buckets, seed=seed) \
        .withColumnRenamed("cnt", "rc")
    tc = bucket_counts(target, text_col, n_buckets=n_buckets, seed=seed) \
        .withColumnRenamed("cnt", "tc")
    # totals ride the n_buckets-row frame as unbounded-window sums
    # (r14): every rc/tc bucket row lands in the frame (bucket = hash %
    # n_buckets), so Σcoalesce(rc,0) over the frame equals the old
    # rc.agg(sum) — which, plan subtrees never being shared, re-ran the
    # whole corpus bucket-count pass per total (2 extra corpus passes).
    # The window input is exactly n_buckets rows — a model, not data.
    w_all = Window.partitionBy()
    j = (frame.join(F.broadcast(rc), "bucket", "left")
         .join(F.broadcast(tc), "bucket", "left")
         .withColumn("rt", F.sum(F.coalesce("rc", F.lit(0))).over(w_all))
         .withColumn("tt", F.sum(F.coalesce("tc", F.lit(0))).over(w_all)))
    p_t = ((F.coalesce("tc", F.lit(0)) + alpha)
           / (F.col("tt") + alpha * n_buckets))
    p_r = ((F.coalesce("rc", F.lit(0)) + alpha)
           / (F.col("rt") + alpha * n_buckets))
    return j.select("bucket",
                    F.round(F.log(p_t / p_r), 6).alias("log_ratio"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    seed: int = 7,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weight per raw document: the sum of its hashed
    grams' bucket log-ratios (≈ log of the target/raw likelihood ratio
    under the bucket n-gram model). High weight ⇒ looks like `target`.

    Returns ``(id_col, dsir_weight)``.

    Scale: the log-ratio table is exactly ``n_buckets`` rows — a MODEL,
    not data — collected once and embedded as a literal map (declared
    metadata-sized collect, same class as the IVF centroid model). The
    scoring pass is then a zero-shuffle projection: each row folds its
    gram array through `element_at(map, md5-bucket)` with decimal
    accumulation. No explode, no join, no exchange — scan speed.
    """
    ratios = dsir_log_ratios(raw, target, text_col, n_buckets=n_buckets,
                             seed=seed, alpha=alpha).collect()
    lut = {int(r["bucket"]): float(r["log_ratio"]) for r in ratios}
    m = F.map_from_arrays(
        F.array(*[F.lit(b) for b in sorted(lut)]),
        F.array(*[F.lit(lut[b]) for b in sorted(lut)]))
    score = let_(
        hashed_grams(text_col),
        lambda grams: F.aggregate(
            grams,
            F.lit(0).cast(_DEC),
            # re-cast: decimal + decimal widens to (29,10), which Spark's
            # aggregate() rejects as a merge type; values stay in range
            lambda acc, g: (acc + F.element_at(
                m, (hash_bucket(g, seed) % n_buckets).cast("int")
            ).cast(_DEC)).cast(_DEC)))
    return raw.select(F.col(id_col),
                      F.round(score.cast("double"), 6).alias("dsir_weight"))


# ------------------------------------------------------------------ PMI


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_k: int | None = 50,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining: adjacent token
    pairs scored by ``ln( p(xy) / (p(x)·p(y)) )`` over the corpus.
    Returns ``(w1, w2, pair_count, pmi)``, the top_k by (pmi desc,
    w1, w2) among pairs seen ≥ min_count times.

    Plan: one groupBy to vocab-sized unigram counts, one to bigram
    counts; the joins back are broadcasts of the unigram table; totals
    ride a literal-key broadcast. The corpus itself shuffles only the
    (token → count) partial aggregates.
    """
    toks = docs.select(_toks(text_col).alias("__tk"))
    uni = (toks.select(F.explode("__tk").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    bi = (toks.select(F.explode(
        let_(F.col("__tk"),
             lambda tk: F.zip_with(
                 F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                 F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                 lambda a, bb: F.struct(a.alias("w1"), bb.alias("w2"))))
    ).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count")))
    # totals ride the count tables (r14): tu = Σcw as an
    # unbounded-window sum over the VOCAB-BOUNDED `uni` aggregate,
    # attached through the c1 broadcast join every bigram row already
    # pays (every w1 is a corpus token, so the inner join always
    # matches); tb = Σpair_count (pre-filter) as a one-row aggregate
    # whose subtree REUSES bi's exchange. Same exact-integer values as
    # the old direct Σlen(t) / Σmax(len(t)-1, 0) corpus aggregate —
    # which, plan subtrees never being shared, was a THIRD full
    # scan+tokenize pass. No window ever sees the bigram table (only
    # uni, bounded by vocabulary, the ngram_lm precedent).
    uni_t = uni.withColumn(
        "tu", F.sum("cw").over(Window.partitionBy()))
    tb_row = (bi.agg(F.sum("pair_count").alias("tb"))
              .withColumn("__k", F.lit(1)))
    j = (bi.filter(F.col("pair_count") >= min_count)
         .join(F.broadcast(uni_t.withColumnRenamed("cw", "c1")
                           .withColumnRenamed("w", "w1")), "w1")
         .join(F.broadcast(uni.withColumnRenamed("cw", "c2")
                           .withColumnRenamed("w", "w2")), "w2")
         .withColumn("__k", F.lit(1))
         .join(F.broadcast(tb_row), "__k"))
    pmi = F.round(F.log(
        (F.col("pair_count") / F.col("tb"))
        / ((F.col("c1") / F.col("tu")) * (F.col("c2") / F.col("tu")))), 6)
    out = j.select("w1", "w2", "pair_count", pmi.alias("pmi"))
    if top_k is not None:
        out = out.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")) \
            .limit(top_k)
    return out


# ---------------------------------------------------------- n-gram LM


def ngram_lm_score(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
    train: DataFrame | None = None,
) -> DataFrame:
    """Perplexity-proxy quality score from a self-trained bigram
    language model (the CCNet/KenLM-style perplexity filter without an
    external model): score = mean over a document's bigrams of
    ``ln P(w2 | w1)`` under add-alpha-smoothed corpus bigram counts.
    Low (very negative) scores flag improbable token sequences —
    gibberish, OCR noise, keyword stuffing; suspiciously high scores
    flag boilerplate. Returns ``(id_col, lm_score, n_bigrams)``; docs
    with fewer than one bigram score null.

    Train on `train` if given (e.g. a high-quality slice — then the
    score measures similarity to THAT distribution), else on `docs`.

    Determinism: counts are exact integers; each occurrence's ``ln P``
    is rounded to 6 dp (identical counts → identical value, so the cut
    is effectively per bigram type); per-document averaging
    decimal-accumulates the rounded values, so the oracle hash-matches
    exactly.

    Scale: bigram/unigram count tables are vocab-bounded reductions
    with map-side combine; scoring joins each document bigram
    OCCURRENCE to its smoothed logprob — a shuffle join on the bigram
    key (broadcastable when the vocab is small; AQE decides), then one
    groupBy(doc). V (distinct unigrams) attaches as a 1-row broadcast.
    """
    src = train if train is not None else docs
    src_toks = src.select(_toks(text_col).alias("__tk"))

    def _bigrams(tk: Column) -> Column:
        return F.zip_with(
            F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
            F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))

    uni = (src_toks.select(F.explode("__tk").alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    bi = (src_toks.select(F.explode(
        let_(F.col("__tk"), _bigrams)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))

    occ = docs.select(
        F.col(id_col),
        F.explode(let_(_toks(text_col), _bigrams)).alias("p")) \
        .select(id_col, "p.w1", "p.w2")
    # smoothed ln P per OCCURRENCE with coalesced counts, so bigrams
    # (or contexts) unseen in an external `train` get the add-alpha
    # floor instead of dropping out of the average; identical counts →
    # identical rounded value, so determinism is unchanged
    if train is None:
        # V (distinct unigrams) rides the vocab-sized `uni` aggregate
        # as a window count instead of a second aggregate over `uni`:
        # `uni` feeding both the join and a count() is a duplicated
        # subtree in the physical plan — a WHOLE extra corpus
        # scan+tokenize+explode+distinct pass just to count the vocab.
        # Correct only in the self-trained case, where every occ.w1 is
        # by construction present in uni so the w1 join always matches
        # and v reaches every row; an external `train` keeps the
        # independent scalar attach below (unmatched w1 still needs v).
        uni_v = uni.withColumn(
            "v", F.count(F.lit(1)).over(Window.partitionBy()))
        j = (occ.join(bi, ["w1", "w2"], "left")
             .join(F.broadcast(uni_v), "w1", "left"))
    else:
        vsize = (uni.agg(F.count(F.lit(1)).alias("v"))
                 .withColumn("__k", F.lit(1)))
        j = (occ.join(bi, ["w1", "w2"], "left")
             .join(F.broadcast(uni), "w1", "left")
             .withColumn("__k", F.lit(1))
             .join(F.broadcast(vsize), "__k"))
    lp = F.round(F.log(
        (F.coalesce("c12", F.lit(0)) + alpha)
        / (F.coalesce("c1", F.lit(0)) + alpha * F.col("v"))), 6)
    # The mean is rounded in INTEGER arithmetic, not float round():
    # dividing a 6-dp sum by a small count lands exactly on 6-dp half
    # boundaries BY CONSTRUCTION (e.g. sum/12 ending in ...15), where
    # Spark's BigDecimal HALF_UP and DuckDB's float-math round diverge
    # (caught by the sf0.1 sweep). Sum in micros is an exact long;
    # round-half-away is then (2|s|+c) div (2c) with the sign restored
    # — bit-identical in any engine.
    scored = (j.groupBy(id_col)
              .agg((F.sum(lp.cast(_DEC)) * 1000000).cast("long")
                   .alias("__s6"),
                   F.count(F.lit(1)).alias("n_bigrams")))
    mean_micro = F.expr(
        "((2 * abs(__s6) + n_bigrams) div (2 * n_bigrams))"
        " * (CASE WHEN __s6 < 0 THEN -1 ELSE 1 END)")
    scored = scored.select(
        F.col(id_col),
        (mean_micro / F.lit(1000000.0)).alias("lm_score"),
        "n_bigrams")
    return (docs.select(F.col(id_col))
            .join(scored, id_col, "left")
            .select(id_col, "lm_score",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams")))


def linear_score(
    docs: DataFrame,
    weights: list[float],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    seed: int = 9,
) -> DataFrame:
    """Hashed-feature LINEAR classifier scoring — the application step
    of a fastText-style quality filter (the DCLM / CCNet curation
    pattern: train a tiny linear model offline on labeled quality
    pairs, score the whole corpus with it, keep the top mass).

    Tokens hash into ``len(weights)`` buckets (the md5-derived
    ``hash_bucket``, same convention as :func:`~jetro_spark.llm.
    similarity.hashed_embedding`); per-doc bucket weights are the
    sublinear tf ``round(ln(1 + count), 6)``; the logit is
    ``bias + Σ_b tf_b · weights[b]`` with the dot decimal-accumulated
    (order-free, engine-identical — the weight vector is a PLAN
    LITERAL, never a join), and ``score = sigmoid(logit)`` rounded to
    6 dp (one transcendental per doc, same rounding contract as the
    tf ``ln``).

    Returns ``(id_col, logit, score)``; token-less docs get the bare
    bias.

    Scale: one groupBy (doc, bucket) with map-side combine (≤ dim rows
    out per doc), then a row-local literal-array lookup — the DSIR
    zero-shuffle scoring shape. Training is out of scope by design:
    a linear model is kilobytes and trains anywhere; SCORING is the
    corpus-scale job.
    """
    dim = len(weights)
    if dim == 0:
        raise ValueError("weights must be non-empty")
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    tl = (docs.select(F.col(id_col),
                      F.explode(_toks(text_col)).alias("__t"))
          .select(id_col, (hash_bucket(F.col("__t"), seed) % dim)
                  .cast("int").alias("__b")))
    tw = (tl.groupBy(id_col, "__b")
          .agg(F.round(F.log(1.0 + F.count(F.lit(1))), 6).alias("__w")))
    dot = (tw.select(id_col,
                     (F.col("__w")
                      * F.element_at(wlit, F.col("__b") + 1))
                     .cast(_DEC).alias("__p"))
           .groupBy(id_col)
           .agg(F.sum("__p").cast("double").alias("__s")))
    logit = F.round(F.lit(float(bias)) + F.coalesce(F.col("__s"),
                                                    F.lit(0.0)), 8)
    return (docs.select(F.col(id_col))
            .join(dot, id_col, "left")
            .select(id_col,
                    logit.alias("logit"),
                    let_(logit, lambda lg: F.round(
                        1.0 / (1.0 + F.exp(-lg)), 6)).alias("score")))
