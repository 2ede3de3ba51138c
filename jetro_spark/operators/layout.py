"""Multi-dimensional data layout: Z-order (Morton) clustering keys and
a range-clustered writer.

Why it matters at 100 TB: parquet/ORC data skipping works off per-file
(and per-row-group) min/max statistics. A table range-partitioned on
ONE column prunes only predicates on that column; interleaving the bits
of several columns into one Morton key and range-clustering on it keeps
files tight in EVERY interleaved dimension at once, so a selective
predicate on any of them skips most files. This is the standard
OPTIMIZE/ZORDER technique of modern lakehouse writers, expressed here
as plain Catalyst bit arithmetic (shift/and/or — whole-stage codegen,
zero shuffle for the key itself; the writer adds the one
repartitionByRange exchange any clustered write needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low `bits` bits of each column.

    Columns must be non-negative integers already quantized to
    ``[0, 2**bits)`` (callers clamp/bucket however fits their data —
    modulo, width_bucket, epoch-day…). With D columns the key uses
    D*bits bits, so D*bits must stay ≤ 63.

    Pure row-local expression: each output bit is
    ``((c >> i) & 1) << (i*D + j)``; the terms occupy disjoint bit
    positions so integer addition IS the bitwise OR — the same closed
    form a SQL oracle can spell with `>>`/`&`/`<<`.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols × {bits} bits exceeds a signed long")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    z: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cs):
            term = F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)),
                               i * d + j)
            z = term if z is None else z + term
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[Column | str],
    *,
    bits: int = 16,
    n_partitions: int | None = None,
    key_col: str = "__zorder",
    keep_key: bool = False,
) -> DataFrame:
    """Cluster `df` for writing: compute the Z-order key, range-
    partition on it (one exchange — range boundaries come from Spark's
    reservoir sample of the key), and sort within each partition so
    row-group min/max stats stay tight inside every file too.

    ``zorder_layout(df, [...]).write.parquet(path)`` is the intended
    use; pass ``keep_key=True`` to retain the key column for
    inspection/tests.
    """
    out = df.withColumn(key_col, zorder_key(cols, bits=bits))
    if n_partitions is not None:
        out = out.repartitionByRange(n_partitions, F.col(key_col))
    else:
        out = out.repartitionByRange(F.col(key_col))
    out = out.sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)


def zorder_key_sql(cols: list[str], *, bits: int = 16) -> str:
    """The exact ANSI-SQL spelling of :func:`zorder_key` over the given
    column/expression strings — one string both DuckDB (oracle gate)
    and Spark SQL parse to the identical integer. Kept next to the
    Column builder so the two can never drift."""
    d = len(cols)
    # every term fully parenthesized: SQL `<<` binds LOOSER than `+`
    # (PostgreSQL/DuckDB precedence), so a bare `a << 0 + b << 1` chain
    # would parse as a << (0 + b) << 1
    terms = [f"(((({c}) >> {i}) & 1) << {i * d + j})"
             for i in range(bits) for j, c in enumerate(cols)]
    return "(" + " + ".join(terms) + ")"
