"""Embedding quantization (north-star extension; no reference analogue).

Scalar int8 quantization per vector: scale = max|x| / 127, q_i =
trunc(x_i / scale * 127 ... ) — stored as ``array<int>`` + one float scale
per row. At 100 TB this is the difference between a 4-byte-per-dim and a
1-byte-per-dim ANN corpus (4x memory/IO on every similarity scan), at a
bounded reconstruction error |x - deq(x)| <= scale.

Cross-engine determinism: the quantized value uses CAST-to-int TRUNCATION
(toward zero), which Spark and DuckDB define identically — half-up rounding
differs in edge handling across engines and would break value checks.
All arithmetic is per-row codegen (map-only, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", levels: int = 127
) -> DataFrame:
    """Attach ``{vec_col}_q array<int>`` and ``{vec_col}_scale double``.

    Zero vectors quantize to all-zero with scale 0 (dequantize restores
    exactly). q_i is in [-levels, levels].
    """
    vec = F.col(vec_col)
    scale = (_max_abs(vec) / F.lit(float(levels))).alias(f"{vec_col}_scale")
    safe = F.when(F.col(f"{vec_col}_scale") > 0, F.col(f"{vec_col}_scale")).otherwise(
        F.lit(1.0)
    )
    out = df.withColumn(f"{vec_col}_scale", scale)
    q = F.transform(vec, lambda x: (x.cast("double") / safe).cast("int"))
    return out.withColumn(f"{vec_col}_q", q)


def dequantize(q_col: Column, scale_col: Column) -> Column:
    """array<int> + scale -> array<double> reconstruction."""
    return F.transform(q_col, lambda v: v.cast("double") * scale_col)


def quantization_error_stats(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """Per-group reconstruction-error contract: every element's absolute
    error must stay within one quantization step (scale), and the mean
    per-vector max-error is reported. Engine-independent columns only."""
    qdf = quantize_embeddings(df, vec_col, levels)
    deq = dequantize(F.col(f"{vec_col}_q"), F.col(f"{vec_col}_scale"))
    max_err = F.aggregate(
        F.zip_with(F.col(vec_col), deq, lambda x, y: F.abs(x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    bound = F.when(
        F.col(f"{vec_col}_scale") > 0, F.col(f"{vec_col}_scale")
    ).otherwise(F.lit(1e-12))
    return (
        qdf.withColumn("__max_err", max_err)
        .withColumn("__ok", (F.col("__max_err") <= bound).cast("long"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("__ok").alias("n_within_bound"),
            # order-insensitive mean: per-row round -> exact decimal sum ->
            # divide (a plain double avg() varies with partial-agg order)
            F.round(
                F.sum(F.round(F.col("__max_err"), 9).cast("decimal(18,12)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_max_err"),
        )
    )
