"""Sequence packing: batch documents into fixed token-budget packs for
pretraining (each pack feeds one context window).

Two strategies, both deterministic:

- **pack_by_cumsum** — expression-only: documents are ordered by a
  deterministic key, the exclusive running token total is computed with
  ONE window pass, and pack_id = floor(running_total / max_tokens).
  Documents that straddle a boundary overflow their pack by up to one
  document (callers truncate or let the trainer crop) — the standard
  streaming-packing approximation. Scales as a single window over the
  order key; with a ``shard`` key the window partitions (and the shuffle
  spreads) by shard.
- **pack_greedy** — exact first-fit-sequential semantics (the
  accumulator RESETS at each break, so no pack ever exceeds max_tokens
  unless a single document does): a stateful fold that SQL windows
  cannot express, run as an Arrow-batched ``mapInPandas`` iterator fold
  over shard-repartitioned, within-partition-sorted data (NOT
  applyInPandas-per-group — the fold walks each partition's batch
  stream, carrying accumulator state across Arrow batches). Shards
  are independent (hash of the key), so parallelism = shard count and
  memory = one shard's (id, n_tokens) pairs — pack locality is traded
  for scale, exactly like the reference trades insertion order for
  distribution anywhere it shards.

Oracle story: pack_by_cumsum is replayed exactly in DuckDB (window sum);
pack_greedy's reset fold is checked by a python-replay pytest instead.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_by_cumsum(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    *,
    order: str | Column,
    shard: str | None = None,
) -> DataFrame:
    """Add ``pack_id`` (long) and ``pack_offset`` (long: the document's
    starting token inside its pack's budget line) by exclusive running
    sum over ``order``. One window shuffle; deterministic given a unique
    order key."""
    o = F.col(order) if isinstance(order, str) else order
    if shard:
        w = (Window.partitionBy(shard).orderBy(o)
             .rowsBetween(Window.unboundedPreceding, -1))
        running = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
        d = df.withColumn("__run", running)
    else:
        # global pack order WITHOUT a single-partition window: two-level
        # distributed prefix sum (identical pack_id values, scale-safe)
        from jetro_spark.operators.prefix import distributed_prefix
        d = distributed_prefix(df, [o], F.col(token_col).cast("long"),
                               out="__run")
        d = d.withColumn("__run", F.col("__run").cast("long"))
    return (d.withColumn("pack_id", F.floor(F.col("__run") / F.lit(max_tokens)))
            .withColumn("pack_offset", F.col("__run") % F.lit(max_tokens))
            .drop("__run"))


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    *,
    order: str | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Exact greedy sequential packing: walk documents in ``order``
    (default: id order) accumulating tokens; start a new pack when the
    next document would exceed ``max_tokens``. Oversized single documents
    get a pack of their own (flagged ``oversize``). Returns
    (shard, pack_id, id, n_tokens, oversize); pack_id is unique within a
    shard — global ids are (shard, pack_id) pairs, avoiding any
    cross-shard coordination."""
    order = order or id_col
    shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    src = df.select(shard_col.alias("shard"), F.col(id_col).alias("id"),
                    F.col(order).alias("__ord"),
                    F.col(token_col).cast("long").alias("n_tokens"))

    out_schema = T.StructType([
        T.StructField("shard", T.IntegerType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("id", src.schema["id"].dataType),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ])

    def fold(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One call per PARTITION; the iterator yields Arrow batches in
        # partition order (already sorted by sortWithinPartitions — do
        # NOT re-sort per batch), so the accumulator must persist ACROSS
        # batches: a per-batch reset would silently break packs at Arrow
        # batch boundaries.
        cur_shard, pack, acc = None, 0, 0
        for pdf in pdfs:
            shards, packs, ids, toks, overs = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.shard != cur_shard:
                    cur_shard, pack, acc = row.shard, 0, 0
                n = int(row.n_tokens)
                if acc > 0 and acc + n > max_tokens:
                    pack += 1
                    acc = 0
                shards.append(row.shard)
                packs.append(pack)
                ids.append(row.id)
                toks.append(n)
                overs.append(n > max_tokens)
                acc += n
            yield pd.DataFrame({"shard": shards, "pack_id": packs, "id": ids,
                                "n_tokens": toks, "oversize": overs})

    # repartition gathers each shard onto one task; sortWithinPartitions
    # fixes the walk order so applyInPandas-free mapInPandas suffices.
    return (src.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "__ord")
            .mapInPandas(fold, schema=out_schema))
