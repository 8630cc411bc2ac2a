"""Corpus-management operators for training pipelines: eval-set
decontamination and deterministic splits.

Scale notes mirror dedup.py: everything is equi-join / hash-bucketed —
no all-pairs work, no driver-side loops, no RNG state (hash-derived
randomness reproduces bit-for-bit on any engine or cluster size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def ngram_contamination(
    docs: DataFrame, eval_docs: DataFrame, n: int = 8
) -> DataFrame:
    """(doc_id, n_hits): training docs sharing at least one n-word
    shingle with the eval set — the standard decontamination check run
    before training so benchmark text is not memorized. Docs with no
    overlap are absent (left-anti join the corpus for the clean set, as
    ``decontaminate`` does).

    Scale: one inverted equi-join on the shingle string. The eval side
    is distinct shingles of the (small) eval corpus — broadcast by
    Catalyst when it fits; the training side streams through one
    explode. ``n_hits`` counts distinct matching shingles per doc.
    """
    tr = shingles(docs, k=n)
    ev = shingles(eval_docs, k=n).select("shingle").distinct()
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, n: int = 8
) -> DataFrame:
    """``docs`` minus every row flagged by ``ngram_contamination`` —
    all columns intact."""
    hits = ngram_contamination(docs, eval_docs, n=n).select("doc_id")
    return docs.join(hits, "doc_id", "left_anti")


def corpus_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    seed: str = "fts",
) -> DataFrame:
    """``docs`` plus a deterministic ``split`` column ("train"/"val"/…).

    The split is a pure function of (seed, doc_id): the first 8 hex
    chars of md5 map to u in [0,1) and cumulative weight thresholds
    pick the label. No RNG state, no sampling skew across partitions,
    stable under repartitioning and re-runs — the properties
    ``DataFrame.randomSplit`` does NOT give you (its assignment depends
    on partition layout). Weights are normalized; insertion order of
    the dict fixes the threshold order.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / float(0x100000000)
    )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)
