"""Deterministic sampling & dataset splits for training-data pipelines.

Everything here is HASH-derived, not RNG-derived: the assignment of a row
depends only on (key, seed), so splits are reproducible across runs,
engines, partitionings, and cluster sizes — the property a train/val/test
split must have (resampling on every run leaks val into train). The hash
is md5 over ``"{key}:{seed}"`` — available verbatim in Spark AND DuckDB,
which is what lets the oracle gate check assignments bit-for-bit.

Scale: pure row-local expressions (no shuffle, no RNG state, no driver
round-trip); a split/sample is a narrow projection/filter that pushes
down the scan like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 16 ** 8  # first 8 md5 hex chars → uniform int in [0, 2^32)


def hash_bucket(key: Column, seed: int = 42) -> Column:
    """Uniform bucket in [0, 2^32) from md5 of "{key}:{seed}"."""
    hx = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")


def hash_fraction(key: Column, seed: int = 42) -> Column:
    """Uniform double in [0, 1) — the comparable form of hash_bucket."""
    return hash_bucket(key, seed) / F.lit(float(_BUCKETS))


def hash_split(
    df: DataFrame,
    key: str | Column,
    weights: dict[str, float],
    *,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative weight thresholds
    over the key's hash fraction. Weights must sum to ~1; the LAST split
    absorbs rounding residue (its upper bound is +inf)."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1 (got {total})")
    k = F.col(key) if isinstance(key, str) else key
    frac = hash_fraction(k, seed)
    names = list(weights)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = frac < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, label)


def hash_sample(
    df: DataFrame,
    key: str | Column,
    fraction: float,
    *,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ~fraction of rows (those whose key hashes
    below the threshold). Unlike df.sample(), re-running — or running on
    a different cluster/partitioning — keeps the SAME rows."""
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(hash_fraction(k, seed) < F.lit(fraction))


def stratified_hash_sample(
    df: DataFrame,
    key: str | Column,
    strata_col: str,
    fractions: dict[str, float],
    *,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-fraction (e.g. downsample boilerplate-heavy sources harder).
    Strata absent from ``fractions`` keep ``default_fraction``."""
    k = F.col(key) if isinstance(key, str) else key
    frac = hash_fraction(k, seed)
    thresh: Column = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(thresh)
    return df.filter(frac < thresh)


def mixture_interleave(
    sources: dict[str, tuple[DataFrame, float]],
    key: str | Column,
    *,
    seed: int = 42,
    source_col: str = "mix_source",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic corpus mixture with per-source sampling RATES.

    A pretraining mix weights corpora differently — rate 0.3 subsamples
    a source to 30%, rate 2.5 repeats it twice plus a 50% subsample of a
    third epoch (small high-quality corpora are commonly repeated).
    Selection is hash-derived from (key, epoch, source-name, seed): the
    mix is bit-reproducible across runs/engines/cluster sizes and
    replayable as SQL, like every sampler in this module.

    Output = union of the tagged survivors (schemas aligned by name,
    missing columns null), with ``epoch_col`` (0-based repeat index) and
    ``source_col`` carrying provenance. Row-local only — the epoch
    fan-out is a generator (no shuffle); at 100 TB each source stays an
    independent scan with its filter pushed down.
    """
    if not sources:
        raise ValueError("need at least one source")
    for name, (df, _r) in sources.items():
        clash = {epoch_col, source_col} & set(df.columns)
        if clash:
            raise ValueError(
                f"source {name!r} already has column(s) {sorted(clash)} — "
                "pass different epoch_col/source_col names")
    parts = []
    for name, (df, rate) in sources.items():
        if rate <= 0:
            raise ValueError(f"rate for {name!r} must be positive")
        full = int(rate)
        frac = rate - full
        n_epochs = full + (1 if frac > 0 else 0)
        k = F.col(key) if isinstance(key, str) else key
        d = df.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1)))
            .alias(epoch_col))
        tag = F.concat(k.cast("string"), F.lit("#"),
                       F.col(epoch_col).cast("string"),
                       F.lit(f"#{name}"))
        keep = (F.col(epoch_col) < F.lit(full)) \
            if frac == 0 else \
            ((F.col(epoch_col) < F.lit(full))
             | (hash_fraction(tag, seed) < F.lit(frac)))
        parts.append(d.filter(keep)
                     .withColumn(source_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture re-weighting (the multilingual-
    pretraining standard, e.g. mBERT/XLM-R exponentiated sampling,
    UniMax's precursor): a group with corpus share ``p_i`` gets
    sampling weight ``q_i = p_i^alpha / Σ_j p_j^alpha``. ``alpha < 1``
    flattens the distribution (upsamples small languages/domains
    without the head swallowing the mix); ``alpha = 1`` is natural
    sampling, ``alpha = 0`` uniform.

    Returns one row per group: ``(group_col, n, p, q)`` — counts,
    natural share, and temperature share, each rounded (6 dp) so the
    values hash-compare across engines. Feed ``q / p`` per group into
    :func:`mixture_interleave` rates to realize the mix.

    Scale: one vocabulary-sized groupBy; BOTH normalizers (total rows,
    Σ p^alpha) ride the group aggregate as unbounded-window sums — the
    window input is the ≤|groups|-row aggregate, never corpus data, so
    the single-partition window is bounded by group cardinality. The
    previous scalar-attach shape (one-row aggregate + broadcast join,
    twice, the second over a subtree containing the first) re-ran the
    whole corpus scan+groupBy chain per normalizer because plan
    subtrees are never shared: 4 corpus passes for one groupBy's worth
    of information. p^alpha is the one transcendental, rounded to
    12 dp before the decimal-exact (order-free) Σ accumulation —
    expression-identical to the old aggregate path, so values hash
    the same.
    """
    from pyspark.sql.window import Window

    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    tot = F.sum("n").over(w).cast("double")
    pa = (cnt.select(group_col, "n",
                     (F.col("n") / tot).alias("__p"),
                     F.round(F.pow(F.col("n") / tot, alpha), 12)
                     .alias("__pa")))
    z = F.sum(F.col("__pa").cast("decimal(28,12)")).over(w).cast("double")
    return (pa.select(group_col,
                      F.col("n").cast("long").alias("n"),
                      F.round("__p", 6).alias("p"),
                      F.round(F.col("__pa") / z, 6).alias("q")))


def cap_per_key(
    df: DataFrame,
    group_col: str | Column,
    n: int,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the per-DOMAIN document cap a
    corpus pipeline applies so boilerplate-heavy hosts cannot dominate
    the mixture (the C4/RefinedWeb-style host cap). WHICH rows survive
    is hash-determined, not arrival-ordered: rows rank by
    ``md5(id:seed)`` inside their group, so the kept set is a uniform,
    reproducible per-group sample — independent of engine,
    partitioning, and cluster size, and re-runnable to the same result
    (the hash_split property). Ties cannot occur (the id is unique and
    feeds the hash input verbatim, and the id itself breaks any
    residual hash collision).

    Scale: one shuffle on the group key; the rank window sorts only
    WITHIN each group (no global sort). A pathological hot key (one
    host = half the corpus) makes one reducer sort its group —
    acceptable because the sort input is the group's (hash, id) pairs,
    not the documents; with AQE skew handling the exchange itself
    splits. The filter keeps ≤ n·|groups| rows, applied before any
    downstream wide transform."""
    from pyspark.sql.window import Window

    g = F.col(group_col) if isinstance(group_col, str) else group_col
    rk = hash_bucket(F.col(id_col), seed)
    w = Window.partitionBy(g).orderBy(rk.asc(), F.col(id_col).asc())
    return (df.withColumn("__cap_rn", F.row_number().over(w))
            .filter(F.col("__cap_rn") <= n).drop("__cap_rn"))


def weighted_hash_sample(
    df: DataFrame,
    k: int,
    weight: str | Column,
    *,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES scheme with hash-derived randomness: every
    row gets key ``u^(1/w)`` (u uniform from md5(id:seed), w = its
    weight) and the k largest keys win; inclusion probability is then
    proportional to weight, and the drawn set is reproducible across
    runs, engines, partitionings, and cluster sizes like every sampler
    in this module. Ranking uses the monotonic form ``ln(u)/w`` (u
    shifted to (0, 1] so ln is finite); rows with null or non-positive
    weight are dropped — they can never be drawn.

    Use it to sample a training subset by quality score, or (with
    ``strata_col``) k docs per language/source weighted by length.

    Scale: global draw = orderBy+limit, which Spark plans as
    TakeOrderedAndProject (per-partition top-k heaps, no global sort —
    only p×k rows reach the reducer). Stratified draw = one shuffle on
    the stratum key with the rank window sorting only within its group
    (the cap_per_key shape — group sort input is (key, id) pairs).
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    out = df.filter(w.isNotNull() & (w > 0))
    # u in (0, 1]: (bucket+1)/2^32 — ln stays finite; u=1 -> key 0 (max)
    es_key = (F.log((hash_bucket(F.col(id_col), seed) + 1)
                    / F.lit(float(_BUCKETS)))
              / w.cast("double"))
    if strata_col is None:
        return (out.withColumn("__es", es_key)
                .orderBy(F.desc("__es"), F.asc(id_col))
                .limit(k).drop("__es"))
    from pyspark.sql.window import Window

    win = (Window.partitionBy(strata_col)
           .orderBy(F.desc("__es"), F.asc(id_col)))
    return (out.withColumn("__es", es_key)
            .withColumn("__es_rn", F.row_number().over(win))
            .filter(F.col("__es_rn") <= k).drop("__es", "__es_rn"))


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    seed: int = 42,
    split_col: str = "split",
    cluster_col: str = "component",
) -> DataFrame:
    """Train/val/test split that can never leak near-duplicates across
    splits: documents are first grouped into duplicate CLUSTERS
    (connected components over `pairs` — typically MinHash-LSH or
    SemDeDup edges), then the cluster label — not the document — is
    hash-assigned, so every member of a duplicate group lands in the
    same split. A plain per-document hash_split puts ~p·(1-p) of each
    near-dup pair across the train/val boundary — the classic
    eval-contamination bug this composition removes.

    Isolated documents form their own singleton cluster (their id).
    Output = `df` + `cluster_col` + `split_col`.

    Scale: the components cost is the pair list's (llm/dedup.py
    connected_components — join+groupBy per diameter iteration); the
    label join back is one shuffle on id; split assignment stays a pure
    row-local md5 expression like hash_split.
    """
    from jetro_spark.llm.dedup import connected_components

    cc = connected_components(pairs, a_col, b_col)
    lab = (df.join(cc, df[id_col] == cc["id"], "left")
           .drop("id")
           .withColumn("component", F.coalesce("component", F.col(id_col))))
    if cluster_col != "component":
        lab = lab.withColumnRenamed("component", cluster_col)
    return hash_split(lab, cluster_col, weights, seed=seed,
                      split_col=split_col)
