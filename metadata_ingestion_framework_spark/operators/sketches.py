"""Count-min sketch: bounded-cardinality frequency estimation (Cormode &
Muthukrishnan 2005, public methodology) — the heavy-hitter face of the
sketch family beside the HLL approx-distinct contract.

North-star extension (no reference analogue; BASELINE.json).

The 100 TB point: an exact term-frequency groupBy shuffles on an UNBOUNDED
key (every distinct n-gram — billions of reducer keys, skew on the head);
the sketch build shuffles on exactly ``depth x width`` keys (a few thousand
counters) with full map-side combining, and the result is a broadcast-size
table any estimate pass equi-joins against. Classic trade: estimates can
only OVERcount (each counter adds colliding keys' mass; the min over
``depth`` independent rows takes the least-polluted one), never undercount
— the one-sided guarantee the contract query checks exactly.

Determinism: positions are ``pmod(xxhash64(key, seed), width)`` — fixed
per (key, config), so sketches are reproducible run-to-run and mergeable
across partitions/batches by counter-wise addition (the same property the
partial aggregation already exploits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(df: DataFrame, key: Column, depth: int, width: int) -> DataFrame:
    out = df.withColumn(
        "__seed", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    )
    return out.withColumn(
        "__pos", F.pmod(F.xxhash64(key, F.col("__seed")), F.lit(width))
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 12,
    weight_col: str | None = None,
) -> DataFrame:
    """(seed, pos, cnt) — the ``depth x width`` counter table. One shuffle
    on a BOUNDED key set (depth*width counters) with map-side combine;
    ``weight_col`` aggregates weighted frequencies (default 1/row)."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    return (
        _positions(df.select(F.col(key_col), w.alias("__w")), F.col(key_col), depth, width)
        .groupBy(F.col("__seed").alias("seed"), F.col("__pos").alias("pos"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 12,
) -> DataFrame:
    """Attach ``cms_est`` to every row of ``keys``: min over the ``depth``
    probed counters (an absent counter is 0). The sketch side is a
    broadcast equi-join on (seed, pos) — the estimate pass never shuffles
    the keys."""
    probes = _positions(keys, F.col(key_col), depth, width)
    joined = probes.join(
        F.broadcast(
            sketch.select(
                F.col("seed").alias("__seed"),
                F.col("pos").alias("__pos"),
                "cnt",
            )
        ),
        ["__seed", "__pos"],
        "left",
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")))
    group_cols = [c for c in keys.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min("cnt").alias("cms_est"))
    )
