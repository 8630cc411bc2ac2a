"""Deterministic cardinality sketching (KMV / bottom-k).

Engine extension beyond the reference (which has no aggregation
surface): the Elasticsearch ``cardinality`` aggregation analog for
counting distinct values per group at 100 TB without a corpus-wide
exact distinct. Spark ships HyperLogLog (``approx_count_distinct``),
but its estimate is implementation-specific — useless for a
cross-engine contract. This module instead implements the K-Minimum-
Values estimator (Bar-Yossef et al. 2002, "Counting distinct elements
in a data stream") with an md5-derived hash, so the estimate is a PURE
FUNCTION of the value set: bit-identical on Spark, DuckDB, or a
pocket calculator — the same determinism trick as
:func:`~inverted_index_spark.pipelines.corpus.corpus_split`.

Estimator: hash every distinct value to u ~ Uniform[0,1); keep each
group's k smallest DISTINCT hashes; if the group has fewer than k
distinct hashes the count is exact, else estimate (k-1)/u_(k) where
u_(k) is the k-th smallest hash (the classic unbiased KMV form).

Scale shape: one (group, value) distinct (map-side partial dedup then
one exchange — the irreducible cost of any distinct count), then a
bottom-k per group via window row_number over the ALREADY-DEDUPED
hashes (each group's sort input is its distinct-hash set, and only k
survive into the final tiny aggregate). At a fixed k the result is
|groups| rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_DENOM = float(16**8)  # first 8 md5 hex chars -> uniform [0, 1)


def _uniform_hash(col) -> "F.Column":
    """md5-derived u in [0,1): pure function of the value string —
    reproducible in any engine with md5 (DuckDB oracle mirrors it)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(HASH_DENOM)
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-value estimate -> (``group_col``,
    n_kept: bigint, est_distinct: double), ordered by group.

    ``n_kept`` is the number of sketch entries retained (== the exact
    distinct count when below ``k``); ``est_distinct`` is the KMV
    estimate — exact (== n_kept) for small groups, (k-1)/u_(k) above.
    Distinct VALUES whose 32-bit hash prefixes collide dedupe into one
    sketch entry (the estimator's standard hash-collision term; at
    k=64 the bias is far below the sketch's own ~1/sqrt(k-2) relative
    error).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashes = (
        df.select(
            F.col(group_col).alias("g"),
            _uniform_hash(F.col(value_col)).alias("u"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("u")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return (
        topk.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.max("u").alias("u_k"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_kept",
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            )
            .otherwise(F.lit(float(k - 1)) / F.col("u_k"))
            .alias("est_distinct"),
        )
        .orderBy(group_col)
    )
