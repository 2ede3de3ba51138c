"""Context-length document chunking — split long documents into
token-budgeted windows with overlap, the preprocessing step between raw
corpus and sequence packing (llm/packing.py) in a pretraining pipeline.

Everything is a row-local expression (tokenize → window starts →
slice → rejoin): no shuffle, no UDF, predicate-pushdown friendly, and
exactly replayable in any engine with regex splitting and list slicing
(the DuckDB oracle does `string_split_regex` + `list_filter` +
`list_slice` + `array_to_string`).

Design notes:
- Chunks are windows over the TOKEN sequence; the chunk text is the
  tokens rejoined with single spaces. Original inter-token whitespace
  is not preserved (a tokenizer-bound pipeline feeds token ids, not
  surface text, downstream — the reconstruction is for inspection and
  dedup, both whitespace-insensitive here).
- ``stride`` is the OVERLAP (tokens shared by consecutive chunks), so
  the window step is ``max_tokens - stride``; the last window may be
  shorter, and is kept when at least ``min_tokens`` long (short tails
  carry real text — dropping them silently loses corpus mass).
- At 100 TB this is embarrassingly parallel: one pass over the text
  column, output fan-out bounded by ceil(n_tokens / step) per doc.
  The explode is Spark's generator path (no row buffering); column
  pruning still reaches the scan because everything derives from the
  one text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jetro_spark.llm.text import ws_tokens


def chunk_starts(n_tokens: Column, max_tokens: int, stride: int) -> Column:
    """0-based start offsets of each window: 0, step, 2*step, … stopping
    once the previous window reached the document end (a start whose
    window adds only already-covered tokens is never emitted). Always at
    least one window, even for empty docs."""
    step = max_tokens - stride
    last = F.greatest(n_tokens - stride - 1, F.lit(0))
    return F.sequence(F.lit(0), last - (last % F.lit(step)), F.lit(step))


def split_by_tokens(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str,
    max_tokens: int,
    stride: int = 0,
    min_tokens: int = 1,
) -> DataFrame:
    """One output row per chunk: (id, chunk_id, n_tokens, chunk_text).

    ``chunk_id`` is the 0-based window index per document; ``n_tokens``
    the actual token count of the chunk (= max_tokens except possibly
    the tail). Documents whose text tokenizes to fewer than
    ``min_tokens`` produce no rows.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= stride < max_tokens:
        raise ValueError("need 0 <= stride < max_tokens")
    step = max_tokens - stride
    toks = ws_tokens(F.col(text_col))
    d = df.select(F.col(id_col).alias("id"), toks.alias("__toks"),
                  F.size(toks).alias("__n"))
    d = d.select(
        "id", "__toks",
        F.posexplode(chunk_starts(F.col("__n"), max_tokens, stride))
        .alias("chunk_id", "__start"))
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
    return (d.select("id", F.col("chunk_id").cast("long").alias("chunk_id"),
                     F.size(piece).cast("long").alias("n_tokens"),
                     F.array_join(piece, " ").alias("chunk_text"))
            .filter(F.col("n_tokens") >= min_tokens))
