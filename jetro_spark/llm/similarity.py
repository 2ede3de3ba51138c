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
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(qid, nid, rank) exact top-k by cosine; self-matches excluded;
    deterministic tie-break on neighbor id."""
    q = F.broadcast(queries.select(F.col(id_col).alias("qid"),
                                   F.col(vec_col).alias("qvec")))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    scored = (q.crossJoin(c)
              .filter(F.col("qid") != F.col("nid"))
              .withColumn("score", cosine(F.col("qvec"), F.col("nvec"))))
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
                                    F.col(vec_col).alias("qvec")))
    cv = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    scored = (pair_ids.join(qv, "qid").join(cv, "nid")
              .withColumn("score", cosine(F.col("qvec"), F.col("nvec"))))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "score"))
