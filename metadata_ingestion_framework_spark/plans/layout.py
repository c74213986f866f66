"""Z-order (Morton) write-time layout for multi-dimensional scan pruning.

A 100 TB table sorted on ONE column prunes beautifully on that column and
not at all on any other; interleaving the bits of several columns into one
Morton key and range-partitioning + sorting on it makes every participating
column's values spatially clustered per file, so parquet min/max stats
prune multi-dimensional box queries on ALL of them (the Delta Lake
``OPTIMIZE ZORDER BY`` technique; Morton codes are textbook public
methodology). The engine's directory-level analogs are the IVF cell and
band-bucket partitioned layouts (``tests/test_layout_pruning.py``); this is
the row-group/file-stats analog for numeric range predicates.

No reference analogue (the reference writes plain append tables;
SURVEY.md §2.2 K4) — north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each non-negative integer
    column into one LONG: bit ``b`` of column ``c`` lands at position
    ``b * n_cols + c``. Pure shift/and/or arithmetic — JVM codegen on the
    Spark side, and the identical expression is generatable as DuckDB SQL
    (``zorder_sql``) so layouts are value-checkable cross-engine. Nulls
    interleave as 0 (they sort first, same as a plain sort).

    ``bits * len(cols)`` must fit in 63 bits. Callers with unbounded or
    signed domains normalize first (e.g. ``F.pmod`` into a power-of-two
    range, or a rank/bin pass — Delta bins by range partition id).
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed long")
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        col = F.coalesce(col, F.lit(0))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + ci
                )
            )
    return z


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB expression computing the SAME Morton key (oracle twin).

    Mirrors ``zorder_value``'s null handling: each column is COALESCEd to 0
    before bit-extraction, so a NULL dimension interleaves as 0 on both
    engines instead of propagating to a NULL key in SQL only.
    """
    n = len(cols)
    terms = [
        f"(((COALESCE({c}, 0) >> {b}) & 1) << {b * n + ci})"
        for ci, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``cols``:
    ``repartitionByRange`` on the key splits the curve into ``n_files``
    contiguous segments (each file covers a compact multi-dimensional
    box), and the within-file sort tightens every file's per-column
    min/max stats — which is exactly what parquet predicate pushdown
    prunes on. Map-side cost is one codegen expression; the range
    partitioning is the one shuffle any clustering write pays.
    """
    z = zorder_value(cols, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
