"""Offline ranking evaluation: nDCG@k, MRR, precision/recall@k.

Engine extension beyond the reference (which stops at scoring): the
evaluation half of the learning-to-rank loop —
:meth:`~inverted_index_spark.query.FtsEngine.ltr_features` logs
training features, an offline ranker reranks, and THIS module scores
the reranked lists against graded judgments (the TREC / ES
rank-eval-API shape).

Every metric is a deterministic closed-form over (rank, rel) pairs, so
the whole computation is plain DataFrame algebra — two broadcast-sized
joins and one groupBy per metric family, no Python, no collect — and a
DuckDB oracle reproduces it bit-for-bit.

Conventions (documented because every IR toolkit chooses differently):

* DCG uses the "burst" gain ``(2^rel - 1) / log2(rank + 1)`` (the
  trec_eval / ES default);
* nDCG normalizes by the ideal DCG of the query's TOP-k judgments
  ordered (rel desc, doc_id asc); queries with no positive judgment
  get ndcg = 0.0 (not NaN);
* MRR is 1/rank of the FIRST retrieved doc with rel > 0 inside the
  cutoff, else 0.0;
* precision@k divides by k (not by |retrieved|: missing tail ranks
  count against the system); recall@k divides by the query's total
  positives, 0.0 when there are none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Score ranked lists against graded judgments.

    ``results``: (query_id, doc_id, rank) with rank 1-based (extra
    columns like score are ignored; ranks > ``k`` are cut off here).
    ``qrels``: (query_id, doc_id, rel) graded relevance, rel >= 0;
    docs absent from qrels are rel 0. Returns one row per query_id in
    ``results``: (query_id, ndcg: double, mrr: double, precision:
    double, recall: double), ordered by query_id.

    Scale shape: judgments join to retrieved lists on (query_id,
    doc_id) — both sides are |queries| * k-ish, tiny next to any
    corpus; the ideal-DCG side is a row_number window over each
    query's judgments. Nothing touches the corpus: evaluation cost is
    a function of the experiment size only.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hits = (
        results.select("query_id", "doc_id", "rank")
        .filter(F.col("rank") <= k)
        .join(
            qrels.select("query_id", "doc_id", "rel"),
            ["query_id", "doc_id"],
            "left",
        )
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(
        F.col("rank") + 1.0
    )
    rr = F.when(F.col("rel") > 0, 1.0 / F.col("rank"))
    per_q = hits.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.max(F.coalesce(rr, F.lit(0.0))).alias("mrr"),
        F.sum((F.col("rel") > 0).cast("int")).alias("n_rel_ret"),
    )
    # ideal DCG: each query's top-k judgments by (rel desc, doc_id asc)
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(iw))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                    / F.log2(F.col("irank") + 1.0),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
            F.count(F.lit(1)).cast("bigint").alias("n_rel_total"),
        )
    )
    return (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.col("dcg") / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
            F.col("mrr").cast("double").alias("mrr"),
            (F.col("n_rel_ret") / F.lit(float(k))).alias("precision"),
            F.when(
                F.coalesce("n_rel_total", F.lit(0)) > 0,
                F.col("n_rel_ret") / F.col("n_rel_total"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
        )
        .orderBy("query_id")
    )
