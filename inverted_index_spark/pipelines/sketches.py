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


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group quantiles (the ES ``percentiles`` aggregation
    analog, ``quantile_disc`` semantics) -> one row per (group, q):
    (``group_col``, q: double, value: double), ordered by (group, q).

    The q-quantile is the value at rank ``ceil(q * n)`` of the sorted
    group (lowest value whose cumulative count reaches the rank) — a
    member of the data, no interpolation, hence bit-identical across
    engines regardless of float-interpolation conventions.

    Scale shape: Spark's exact ``percentile`` buffers every group value
    on one reducer — a corpus-sized group OOMs it. This plan never
    holds a group in memory: (1) partial-agg count per (group, value) —
    the only corpus-sized exchange, map-side combined; (2) cumulative
    count via a window over the DISTINCT values of each group (the
    compressed domain, typically orders of magnitude smaller than the
    rows); (3) per q, the first value whose cumulative count >= rank.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"every q must be in (0, 1], got {qs}")
    counts = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("g").orderBy("v")
    cum = counts.select(
        "g",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        cum.join(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("g", "q")
        .agg(F.min("v").cast("double").alias("value"))
        .select(F.col("g").alias(group_col), "q", "value")
        .orderBy(group_col, "q")
    )


def heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n: int = 10,
) -> DataFrame:
    """Top-``n`` most frequent values per group (the nested ES ``terms``
    aggregation: "per lang, the 10 commonest tokens") ->
    (``group_col``, value, cnt: bigint, rank: int), ties broken by
    value asc for determinism, ordered by (group, rank).

    Scale shape: one partial-agg count per (group, value) — map-side
    combined, the only corpus-sized exchange — then a row_number window
    over each group's (cnt desc, value asc) order. The window input is
    the compressed (group, value) domain; at 100 TB this is the
    standard two-stage top-k and never materializes a group's raw rows.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    counts = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("cnt"), F.asc("v"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(
            F.col("g").alias(group_col),
            F.col("v").alias("value"),
            "cnt",
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy(group_col, "rank")
    )


def group_quantiles_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
) -> DataFrame:
    """Mergeable approximate per-group quantiles with a RELATIVE-error
    guarantee (the DDSketch scheme — Masson et al., VLDB 2019) -> one
    row per (group, q): (``group_col``, q: double, value: double
    rounded to 4 decimals), ordered by (group, q).

    Values are log-binned: bin ``ceil(ln(v) / ln(gamma))`` with
    ``gamma = (1 + alpha) / (1 - alpha)``, representative
    ``2 * gamma^bin / (gamma + 1)`` (the bin's geometric midpoint), so
    every value in a bin is within relative ``alpha`` of the
    representative. The returned quantile is the representative of the
    bin the exact ``quantile_disc`` value falls in (binning preserves
    order and multiplicity), hence
    ``|approx - exact| <= alpha * exact`` — pinned by a property test.
    Non-negative values only (``v == 0`` gets its own exact bin);
    negative input raises, matching DDSketch's positive-store contract.

    Why not :func:`group_quantiles` at 100 TB: the exact path's
    exchange is the per-(group, value) count — |distinct values| rows —
    and its cumulative window walks each group's full distinct domain.
    Here the exchange and the window are both bounded by the BIN count,
    O(log(max/min) / alpha) per group (~2.3k bins for values spanning
    1..1e10 at alpha=0.01) regardless of how many distinct values the
    corpus holds, and bin counts are plain sums — partial-agg
    combinable map-side and mergeable across days/shards/streams.
    (Spark's builtin ``percentile_approx`` is the same idea with a GK
    sketch but rank-error semantics and implementation-defined
    results — unusable for a cross-engine contract; this sketch is a
    pure function of the multiset.)

    Determinism note: the bin index is computed from IEEE-double ``ln``
    with a 1e-9 downward guard, so a value sitting within one ulp of a
    bin boundary bins identically across engines in practice; outputs
    round to 4 decimals like the other cross-engine float contracts.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"every q must be in (0, 1], got {qs}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    ln_gamma = math.log(gamma)
    v = F.col(value_col).cast("double")
    zero_bin = -(10**9)  # sorts below every log bin we can reach
    bin_col = (
        F.when(v < 0, F.raise_error(F.lit(
            "group_quantiles_approx: negative values unsupported"
        )))
        .when(v == 0, F.lit(zero_bin).cast("bigint"))
        .otherwise(
            F.ceil(F.log(v) / F.lit(ln_gamma) - F.lit(1e-9)).cast("bigint")
        )
    )
    binned = (
        df.select(F.col(group_col).alias("g"), bin_col.alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("g").orderBy("b")
    cum = binned.select(
        "g",
        "b",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    rep = F.when(F.col("b") == zero_bin, F.lit(0.0)).otherwise(
        F.lit(2.0)
        * F.pow(F.lit(gamma), F.col("b"))
        / F.lit(gamma + 1.0)
    )
    return (
        cum.join(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("g", "q")
        .agg(F.min("b").alias("b"))
        .select(
            F.col("g").alias(group_col),
            "q",
            F.round(rep, 4).alias("value"),
        )
        .orderBy(group_col, "q")
    )
