"""Similarity search over embedding columns (array<float>).

Two paths:

- **brute_force_topk** — exact cosine top-k of every query against the
  corpus. The query side is broadcast (BroadcastNestedLoopJoin): the
  corpus never shuffles, cost is |Q|·|C| row-local dot products +
  a per-query top-k (rank window partitioned by query). Exact baseline
  and the oracle for the approximate path.
- **hyperplane_lsh_topk** — random-hyperplane LSH (SimHash for vectors):
  L tables × m-bit signs bucket the corpus; candidates join per bucket,
  exact cosine reranks. Sub-linear candidate count at scale, recall
  tunable via (tables, bits). No all-pairs join.

Dot products are sequential left-to-right double folds — bit-identical
to an equivalent engine's double accumulation, which makes exact oracle
comparison possible.
"""

from __future__ import annotations

import hashlib
import math
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero vector has norm 0 and bare division ANSI-throws;
    # NULL (undefined similarity) matches DuckDB's divide-by-zero result
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (``array<double>``); components of a
    zero vector map to NULL (undefined direction — matches try_divide /
    DuckDB x/0 semantics). Norm is let_-bound: referenced once per
    component otherwise (HOFs have no CSE)."""
    from jetro_spark.functions.arrays import let_

    return let_(a, lambda v: let_(
        l2_norm(v),
        lambda n: F.transform(v, lambda x: F.try_divide(x.cast("double"),
                                                        n))))


def int8_quantize(a: Column) -> Column:
    """Symmetric absmax int8 quantization: ``struct(scale, codes)`` with
    ``scale = absmax/127`` and ``codes[i] = floor(x/scale + 0.5)`` (the
    engine-portable half-up rounding — floor on exact doubles is
    bit-identical across engines, unlike round()). A zero vector gets
    scale 0 and all-zero codes. Row-local, expression-only: at 100 TB
    this is the 4x storage/bandwidth shrink before ANN, running at scan
    speed."""
    from jetro_spark.functions.arrays import let_

    def _q(v: Column) -> Column:
        absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        return let_(absmax / F.lit(127.0), lambda scale: F.struct(
            scale.alias("scale"),
            F.when(scale > 0, F.transform(
                v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5))
                .cast("int")))
            .otherwise(F.transform(v, lambda x: F.lit(0)))
            .alias("codes")))

    return let_(a, _q)


def int8_dequantize(q: Column) -> Column:
    """Inverse of :func:`int8_quantize`: ``codes[i] * scale`` as
    ``array<double>`` (reconstruction error <= scale/2 per component)."""
    from jetro_spark.functions.arrays import let_

    return let_(q, lambda s: F.transform(
        s.getField("codes"),
        lambda c: c.cast("double") * s.getField("scale")))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(qid, nid, rank) exact top-k by cosine; self-matches excluded;
    deterministic tie-break on neighbor id.

    Norms are precomputed per SIDE before the pair join (array folds are
    interpreted CodegenFallback — 1 fold per pair instead of 3; the
    score value is bit-identical since l2_norm(a)*l2_norm(b) evaluates
    the same doubles in the same order)."""
    q = F.broadcast(queries.select(F.col(id_col).alias("qid"),
                                   F.col(vec_col).alias("qvec"))
                    .withColumn("__qn", l2_norm(F.col("qvec"))))
    c = (corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
         .withColumn("__nn", l2_norm(F.col("nvec"))))
    scored = (q.crossJoin(c)
              .filter(F.col("qid") != F.col("nid"))
              .withColumn("score", F.try_divide(
                  dot(F.col("qvec"), F.col("nvec")),
                  F.col("__qn") * F.col("__nn"))))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "score"))


def _planes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (sha256 counter stream →
    floats in [-1, 1]); same planes every run and on every executor."""
    out = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.sha256(struct.pack("<III", seed, i, j)).digest()
            (u,) = struct.unpack("<Q", h[:8])
            row.append(u / 2**63 - 1.0)
        out.append(row)
    return out


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> list[Column]:
    """Sign bit per plane: dot(vec, plane) >= 0."""
    bits = []
    for row in planes:
        lit_plane = F.array(*[F.lit(v) for v in row])
        bits.append((dot(vec, lit_plane) >= 0).cast("int"))
    return bits


def lsh_bucket_keys(vec: Column, *, tables: int = 8, bits: int = 8,
                    dim: int = 64, seed: int = 7) -> Column:
    """One bucket key per table: pack `bits` sign bits into an int.
    array<struct<table, key>> for posexplode."""
    planes = _planes(tables * bits, dim, seed)
    sig = hyperplane_signature(vec, planes)
    keys = []
    for t in range(tables):
        key = F.lit(0)
        for b in range(bits):
            key = key * 2 + sig[t * bits + b]
        keys.append(key)
    return F.array(*keys)


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean vector (class centroid / prototype): posexplode →
    per-(label, position) mean → reassemble ordered arrays. One shuffle
    on (label, pos) with map-side partials; output rows = |labels|.

    Position means accumulate in EXACT decimal (order-independent), so
    the result is reproducible across partitionings and engines — a
    float sum's value depends on reduction order, which would make the
    centroid non-deterministic run-to-run at scale."""
    pos = df.select(F.col(label_col).alias("label"),
                    F.posexplode(F.col(vec_col)).alias("pos", "x"))
    # exact decimal sum → double, THEN divide: decimal-division scale
    # rules differ between engines, double division of identical
    # operands does not
    means = pos.groupBy("label", "pos").agg(
        (F.sum(F.col("x").cast("decimal(28,10)")).cast("double")
         / F.count(F.lit(1))).alias("m"))
    return (means.groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("centroid")))


def seed_centroids(corpus: DataFrame, n_cells: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   ) -> list[tuple[int, list[float]]]:
    """Deterministic IVF centroids: the ``n_cells`` lowest-id corpus
    vectors. Real IVF k-means-trains these; seeding keeps the whole index
    ORACLE-EXACT (DuckDB re-derives identical centroids from the table)
    while the distributed plumbing — assignment, probing, rerank — is the
    same either way. Pass externally trained centroids to ivf_topk to
    swap the policy without touching the plan. The collect() is the index
    BUILD step (n_cells rows, driver-side, once) — queries stay lazy."""
    rows = (corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
            .filter(F.col("i") < n_cells).orderBy("i").collect())
    return [(int(r["i"]), [float(x) for x in r["v"]]) for r in rows]


def train_centroids(
    corpus: DataFrame, n_cells: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
    *, iters: int = 5,
) -> list[tuple[int, list[float]]]:
    """K-means-trained IVF centroids (Lloyd's), fully distributed and
    deterministic — the production index-build step that seed_centroids
    stands in for when oracle exactness is needed.

    Per iteration: assignment is the same row-local centroid-literal
    expression queries use (ivf_cell — zero shuffle), the mean update is
    label_centroids' posexplode + exact-decimal position means (one
    shuffle on (cell, pos), order-independent → bit-stable across
    partitionings), and only the n_cells x dim MODEL is collected
    driver-side. Empty cells keep their previous centroid. Determinism:
    seeded init (lowest-id vectors), tie-broken assignment, exact-decimal
    means — two runs over the same table give identical centroids.

    Scale: iteration cost = one corpus scan + one (cell,pos)-key shuffle
    with map-side partials; the driver only ever holds the model. Gate:
    tests/test_llm.py asserts recall@10 >= 0.9 vs brute_force_topk and
    run-to-run determinism; scripts/check_oracle.py applies the same
    recall tolerance against DuckDB's exact top-k."""
    cents = seed_centroids(corpus, n_cells, id_col, vec_col)
    src = corpus.select(F.col(vec_col).alias("__v"))
    for _ in range(iters):
        assigned = src.select(ivf_cell(F.col("__v"), cents).alias("label"),
                              F.col("__v").alias("embedding"))
        got = {int(r["label"]): [float(x) for x in r["centroid"]]
               for r in label_centroids(assigned).collect()}
        cents = [(cell, got.get(cell, vec)) for cell, vec in cents]
    return cents


def _py_norm(vec: list[float]) -> float:
    """Sequential left-to-right double fold, matching BOTH the Column
    fold (l2_norm) and DuckDB's list_sum bit-for-bit — centroid norms can
    therefore be baked in as literals without perturbing any comparison."""
    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)  # sqrt, not **0.5: pow(x,.5) isn't bit-guaranteed


def _cell_scores(vec: Column, centroids: list[tuple[int, list[float]]]) -> list[Column]:
    """Per-cell ranking score dot(vec, centroid) / ||centroid||, with
    centroids embedded as literals — row-local JVM expressions, zero
    shuffle for assignment.

    The row's own norm is deliberately ABSENT: it is a positive constant
    across the cells of one row, so dividing by it cannot change the
    argmax/top-n_probe ordering — and Spark's higher-order array folds
    are CodegenFallback (interpreted per element, no codegen CSE), so
    dropping it cuts the per-row fold count from 48 to 16. Centroid
    norms are driver-computed literal doubles (_py_norm matches the SQL
    oracle's sqrt(list_sum) fold bit-for-bit; the oracle ranks cells by
    this same norm-free formula so float near-ties agree)."""
    out = []
    for _, cvec in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in cvec])
        out.append(dot(vec, lit_c) / F.lit(_py_norm(cvec)))
    return out


def ivf_cell(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine cell id (ties → lowest cell). array_max over
    struct(score, -cell) is lexicographic: max score, then max(-cell)."""
    scores = _cell_scores(vec, centroids)
    arr = F.array(*[
        F.struct(s.alias("s"), F.lit(-cell).alias("nc"))
        for (cell, _), s in zip(centroids, scores)])
    return (-F.array_max(arr)["nc"]).cast("int")


def ivf_probe_cells(vec: Column, centroids: list[tuple[int, list[float]]],
                    n_probe: int) -> Column:
    """The n_probe nearest cells (by centroid cosine, ties → lowest id):
    sort struct(-score, cell) ascending, slice, project the cell field."""
    scores = _cell_scores(vec, centroids)
    arr = F.array(*[
        F.struct((-s).alias("ns"), F.lit(cell).alias("c"))
        for (cell, _), s in zip(centroids, scores)])
    top = F.slice(F.array_sort(arr), 1, n_probe)
    return F.transform(top, lambda x: x["c"])


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    *, n_cells: int = 16, n_probe: int = 4,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_cells`` Voronoi cells around centroids, probe only the
    ``n_probe`` cells nearest each query, exact-cosine rerank the
    candidates. The third ANN strategy next to brute_force_topk (exact
    baseline) and hyperplane_lsh_topk (hash buckets).

    Scale shape: cell assignment and probe selection are row-local
    centroid-literal expressions (no shuffle — mirrors the LSH plane
    literals); the candidate set forms by ONE equi-join on cell id
    (a corpus vector lives in exactly one cell and a query probes
    distinct cells, so no dedup pass is needed, unlike LSH's per-table
    buckets) — and because of that no-dedup property the corpus vector
    and its norm ride the SAME join (r14): the old id-first shape
    (pair ids, then a second corpus scan joined back on nid) paid a
    whole extra scan + an nid exchange for a dedup stage IVF does not
    have. Cell+norm are pinned under a Generate so the join's inferred
    isnotnull(cell) cannot be pushed below the projection and
    re-evaluate the 16-centroid argmax fold per row a second time
    (r14 plan audit: the Filter node carried the full fold). Rerank
    shuffles candidates only. Hot cells are ordinary join skew → AQE.
    Recall tunes via n_probe/n_cells."""
    if centroids is None:
        centroids = seed_centroids(corpus, n_cells, id_col, vec_col)

    corpus_cells = (corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        F.explode(F.array(F.struct(
            ivf_cell(F.col(vec_col), centroids).alias("cell"),
            l2_norm(F.col(vec_col)).alias("nn")))).alias("__m"))
        .select("nid", "nvec",
                F.col("__m.cell").alias("cell"),
                F.col("__m.nn").alias("__nn")))
    probes = queries.select(
        F.col(id_col).alias("qid"),
        F.explode(ivf_probe_cells(F.col(vec_col), centroids, n_probe)).alias("cell"))

    qv = F.broadcast(queries.select(F.col(id_col).alias("qid"),
                                    F.col(vec_col).alias("qvec"))
                     .withColumn("__qn", l2_norm(F.col("qvec"))))
    # per-side norms: 1 interpreted fold per candidate pair, not 3
    scored = (probes.join(corpus_cells, "cell")
              .filter(F.col("qid") != F.col("nid"))
              .join(qv, "qid")
              .withColumn("score", F.try_divide(
                  dot(F.col("qvec"), F.col("nvec")),
                  F.col("__qn") * F.col("__nn"))))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "score"))


# ------------------------------------------------- product quantization


def train_pq_codebooks(
    corpus: DataFrame, *, m: int = 4, ksub: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    iters: int = 3, dim: int | None = None,
) -> list[list[list[float]]]:
    """Per-subspace PQ codebooks: split the ``dim`` dimensions into
    ``m`` contiguous subspaces and k-means ``ksub`` centroids in each —
    the classic product-quantization index build (Jégou et al. 2011).
    Reuses train_centroids per subspace (seeded, deterministic,
    distributed; only the m x ksub x dim/m MODEL ever reaches the
    driver). Returns ``codebooks[s][j]`` = centroid ``j`` of subspace
    ``s``."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        sliced = corpus.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), s * d + 1, d).alias(vec_col))
        cents = train_centroids(sliced, ksub, id_col, vec_col, iters=iters)
        books.append([vec for _, vec in cents])
    return books


def pq_encode(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """PQ codes (``array<int>``, length m): per subspace, the centroid
    minimizing L2 distance — computed as argmax of
    ``dot(v_s, c) - ||c||²/2`` (the row's own subnorm is constant per
    subspace, so it drops from the argmin; centroid half-norms are
    driver-side literal doubles). Row-local, zero shuffle — the
    codebook-literal pattern of ivf_cell/hyperplane LSH."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    codes = []
    for s, book in enumerate(codebooks):
        sub = F.slice(vec, s * d + 1, d)
        scored = []
        for j, cvec in enumerate(book):
            half = 0.0
            for x in cvec:
                half += x * x
            lit_c = F.array(*[F.lit(float(x)) for x in cvec])
            scored.append(F.struct(
                (dot(sub, lit_c) - F.lit(half / 2.0)).alias("s"),
                F.lit(-j).alias("nj")))
        codes.append((-F.array_max(F.array(*scored))["nj"]).cast("int"))
    return F.array(*codes)


def pq_adc_dot(qvec: Column, codes: Column,
               codebooks: list[list[list[float]]]) -> Column:
    """Asymmetric-distance (ADC) dot product: exact query subvectors
    against the candidate's RECONSTRUCTED subvectors —
    ``sum_s dot(q_s, codebook[s][codes[s]])``. The codebooks embed as a
    nested literal array indexed by the code column, so scoring touches
    only (qvec, codes): the corpus vectors themselves never join into
    the candidate scoring stage."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    books_lit = F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cvec])
                  for cvec in book])
        for book in codebooks])
    from jetro_spark.functions.arrays import let_

    def _score(bks: Column) -> Column:
        terms = []
        for s in range(m):
            sub = F.slice(qvec, s * d + 1, d)
            cent = F.element_at(F.element_at(bks, s + 1),
                                F.element_at(codes, s + 1) + 1)
            terms.append(dot(sub, cent))
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    return let_(books_lit, _score)


def pq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    *, m: int = 4, ksub: int = 8, rerank: int = 50,
    codebooks: list[list[list[float]]] | None = None,
    n_cells: int = 16, n_probe: int = 6,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: IVF cells prune the corpus (equi-join
    on cell id), ADC scoring over m-byte codes picks the top ``rerank``
    candidates per query WITHOUT touching corpus vectors, and only that
    shortlist joins the full vectors for the exact-cosine final top-k.

    Scale story: the candidate stage carries (nid, cell, codes) — the
    codes are m ints, a ~dim·4/m compression of the vector — so the
    shuffle and scoring work per candidate shrinks by that factor; the
    full-width vectors are only read for |Q| x rerank rows. This is the
    standard billion-scale ANN layout (IVF for pruning, PQ for cheap
    scoring, exact rerank for precision)."""
    if centroids is None:
        centroids = seed_centroids(corpus, n_cells, id_col, vec_col)
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, m=m, ksub=ksub,
                                       id_col=id_col, vec_col=vec_col)

    # cell+codes pinned under a Generate: the cell join's inferred
    # isnotnull(cell) would otherwise push below the projection and
    # re-evaluate the 16-centroid argmax fold per corpus row (r14 —
    # same fix as ivf_topk / semantic_dedup_pairs)
    corpus_side = (corpus.select(
        F.col(id_col).alias("nid"),
        F.explode(F.array(F.struct(
            ivf_cell(F.col(vec_col), centroids).alias("cell"),
            pq_encode(F.col(vec_col), codebooks).alias("codes"))))
        .alias("__m"))
        .select("nid", F.col("__m.cell").alias("cell"),
                F.col("__m.codes").alias("codes")))
    probes = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(ivf_probe_cells(F.col(vec_col), centroids,
                                  n_probe)).alias("cell"))
    cand = (probes.join(corpus_side, "cell")
            .filter(F.col("qid") != F.col("nid"))
            .withColumn("adc", pq_adc_dot(F.col("qvec"), F.col("codes"),
                                          codebooks)))
    w_adc = Window.partitionBy("qid").orderBy(F.col("adc").desc(),
                                              F.col("nid").asc())
    shortlist = (cand.withColumn("__r", F.row_number().over(w_adc))
                 .filter(F.col("__r") <= rerank)
                 .select("qid", "nid"))
    qv = F.broadcast(queries.select(F.col(id_col).alias("qid"),
                                    F.col(vec_col).alias("qvec"))
                     .withColumn("__qn", l2_norm(F.col("qvec"))))
    cv = (corpus.select(F.col(id_col).alias("nid"),
                        F.col(vec_col).alias("nvec"))
          .withColumn("__nn", l2_norm(F.col("nvec"))))
    scored = (shortlist.join(qv, "qid").join(cv, "nid")
              .withColumn("score", F.try_divide(
                  dot(F.col("qvec"), F.col("nvec")),
                  F.col("__qn") * F.col("__nn"))))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "score"))


def hyperplane_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    *, tables: int = 8, bits: int = 8, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: bucket join on any shared (table, key), exact
    cosine rerank of candidates. Audit the plan: corpus shuffles once by
    (table, key); candidates only — never all pairs.

    The bucket frames and the candidate `.distinct()` carry IDS ONLY —
    a pair found in several tables dedups on (qid, nid) before the
    embedding vectors are joined back for the rerank (same id-first
    shape as the MinHash pipeline, dedup.py). Shuffling 1k-dim vectors
    through the dedup exchange would be the heaviest possible distinct
    at 100 TB."""
    def bucket_ids(df: DataFrame, idn: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idn),
            F.posexplode(lsh_bucket_keys(F.col(vec_col), tables=tables,
                                         bits=bits, dim=dim)).alias("tbl", "key"))

    pair_ids = (bucket_ids(queries, "qid").join(bucket_ids(corpus, "nid"),
                                                ["tbl", "key"])
                .filter(F.col("qid") != F.col("nid"))
                .select("qid", "nid")
                .distinct())
    qv = F.broadcast(queries.select(F.col(id_col).alias("qid"),
                                    F.col(vec_col).alias("qvec"))
                     .withColumn("__qn", l2_norm(F.col("qvec"))))
    cv = (corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
          .withColumn("__nn", l2_norm(F.col("nvec"))))
    # per-side norms: 1 interpreted fold per candidate pair, not 3
    scored = (pair_ids.join(qv, "qid").join(cv, "nid")
              .withColumn("score", F.try_divide(
                  dot(F.col("qvec"), F.col("nvec")),
                  F.col("__qn") * F.col("__nn"))))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "score"))


def hashed_embedding(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    seed: int = 9,
    idf: bool = False,
) -> DataFrame:
    """Feature-hashing document embedding (the HashingTF / "hashing
    trick" vectorizer): tokens hash into ``dim`` buckets, bucket values
    are sublinear tf weights ``ln(1 + count)``, and the vector is
    L2-normalized — a deterministic, model-free text embedding that
    plugs straight into this package's ANN / SemDeDup / embed_neardup
    operators when no learned embedder is available.

    ``idf=True`` (r9) upgrades the weights to TF-IDF: each bucket's tf
    weight is scaled by the smooth inverse document frequency
    ``ln((N+1)/(df_b+1)) + 1`` (the sklearn TfidfVectorizer
    convention), with df at the BUCKET grain so the statistics table
    stays ≤ dim rows — broadcast back, plus the corpus size N as a
    one-row-aggregate scalar attach (the bm25 pattern). Down-weights
    ubiquitous vocabulary so near-dup and topic similarity stop being
    dominated by stopword mass.

    Returns ``(id_col, embedding array<double>)``; empty-token docs get
    the zero vector.

    Determinism: buckets are md5-derived (engine-replayable); the tf
    weight is the one transcendental, rounded to 6 dp at the
    (doc, bucket) grain; the squared norm decimal-accumulates
    (order-free), so components hash-compare after a final 8 dp round.

    Scale: one groupBy (doc, bucket) with map-side combine (≤ dim rows
    out per doc), one groupBy (doc) to assemble the dense array —
    everything else row-local. dim is a constant: the embedding adds
    8·dim bytes/doc, so bandwidth stays bounded regardless of text
    length.
    """
    from jetro_spark.functions.arrays import let_
    from jetro_spark.llm.sampling import hash_bucket
    from jetro_spark.llm.text import normalize_text, ws_tokens

    toks = ws_tokens(normalize_text(F.col(text_col)))
    if idf:
        # r14 plan shape: ONE corpus tokenize+bucket pass shared by the
        # tf and bucket-df aggregations. The old dfb = tw.groupBy(__b)
        # re-ran the whole scan+tokenize+md5 chain (plan subtrees are
        # never shared), and tf→vec paid two exchanges ((id,b) then
        # (id)). Repartitioning the token stream by id once makes
        # hashpartitioning(id) satisfy BOTH downstream groupings
        # ((id,b) tf and (id) vector assembly run exchange-free on top)
        # and — because the explicit isnotnull(id) filter below keeps
        # the two consumers' subtrees canonically identical (the final
        # left join infers it on the tf branch only otherwise) — AQE
        # reuses the exchange, so the corpus is read and tokenized
        # exactly once. Cost: the shared exchange carries token-level
        # (id, bucket) int pairs instead of map-side-combined
        # (id,b,count) rows; the saved full corpus pass dominates that
        # at any scale. Null-id docs (cannot receive a non-zero vector
        # anyway: the final attach joins on id) are excluded from the
        # df statistics by the same filter.
        src = docs.filter(F.col(id_col).isNotNull())
        tl = src.select(F.col(id_col), F.explode(toks).alias("__t")) \
            .select(id_col, (hash_bucket(F.col("__t"), seed) % dim)
                    .cast("int").alias("__b")) \
            .repartition(id_col)
        dfb = (tl.select(id_col, "__b").distinct()
               .groupBy("__b").agg(F.count(F.lit(1)).alias("__df")))
        tw = (tl.groupBy(id_col, "__b")
              .agg(F.round(F.log(1.0 + F.count(F.lit(1))), 6)
                   .alias("__w")))
        # corpus size N over ALL docs (a null-id doc still counts):
        # one-row aggregate joined on a folded always-true key — the
        # canonical scalar attach, never input data
        nrow = docs.agg(F.count(F.lit(1)).alias("__n"))
        tw = (tw.join(F.broadcast(dfb), "__b")
              .join(F.broadcast(nrow), F.lit(1) == F.lit(1))
              .select(id_col, "__b",
                      F.round(F.col("__w") * F.round(
                          F.log((F.col("__n") + 1.0)
                                / (F.col("__df") + 1.0)) + 1.0, 6),
                          6).alias("__w")))
    else:
        # no df table to share → keep the map-side-combined (id,b)
        # partial aggregate before any exchange (guide §2.3 "aggregate
        # before you shuffle"): a by-id repartition of raw token rows
        # measured ~28% faster locally (one exchange, fewer stages) but
        # shuffles tokens/doc rows instead of ≤dim combined rows per
        # doc — strictly more exchange bytes at scale, with no saved
        # corpus pass to pay for them
        tl = docs.select(F.col(id_col), F.explode(toks).alias("__t")) \
            .select(id_col, (hash_bucket(F.col("__t"), seed) % dim)
                    .cast("int").alias("__b"))
        tw = (tl.groupBy(id_col, "__b")
              .agg(F.round(F.log(1.0 + F.count(F.lit(1))), 6)
                   .alias("__w")))
    vec = (tw.groupBy(id_col)
           .agg(F.map_from_entries(
               F.collect_list(F.struct("__b", "__w"))).alias("__m")))
    arr = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                      lambda i: F.coalesce(
                          F.element_at("__m", i.cast("int")), F.lit(0.0)))
    # squared-norm via DECIMAL accumulation: each square is a
    # deterministic IEEE product of identical doubles, the decimal cut
    # makes the SUM order-free, so the norm is engine-identical without
    # assuming any engine's float fold order
    emb = let_(arr, lambda a: let_(
        F.aggregate(a, F.lit(0).cast("decimal(28,12)"),
                    lambda acc, x: (acc + (x * x).cast("decimal(28,12)"))
                    .cast("decimal(28,12)")).cast("double"),
        lambda ss: F.when(ss > 0, F.transform(
            a, lambda x: x / F.sqrt(ss))).otherwise(a)))
    return (docs.select(F.col(id_col))
            .join(vec, id_col, "left")
            .select(id_col,
                    F.coalesce(
                        emb,
                        F.array_repeat(F.lit(0.0), dim)).alias("embedding")))
