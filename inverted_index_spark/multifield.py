"""Multi-field ranked retrieval: BM25F, dis_max and most_fields.

The reference indexes a single text per doc (src/index.rs:36-51 — one
``&str`` per ``index()`` call); real search engines index several
fields per document (title/body; for transcripts: text vs tool output)
and combine per-field evidence at score time. This module adds that
surface as an engine extension, Spark-first:

* one full-token :class:`~inverted_index_spark.build.FtsIndex` per
  field — every existing kernel (sorted postings, sargable term
  pruning, broadcast per-term stats) is reused unchanged, and each
  field keeps its own honest length statistics (title avgdl is not
  polluted by body lengths);
* **BM25F** (Zaragoza et al., TREC-13 "Simple BM25 extension to
  multiple weighted fields"): per-field length-normalized tf are
  combined into one weighted pseudo-frequency BEFORE the k1
  saturation, with a shared idf from the combined (any-field)
  document frequency.  With a single field at weight 1 this reduces
  exactly to the engine's BM25 (pinned by test);
* **dis_max** ("best_fields"): rank by the best single field's BM25,
  plus ``tie_breaker`` times the others — Lucene's DisjunctionMaxQuery;
* **most_fields**: weighted sum of per-field BM25 scores.

Every path is a pure DataFrame plan: term-pruned postings scans
(``term IN (...)`` over term-sorted parquet), |terms|-row broadcast
stat joins, one partial-agg groupBy per combine — no corpus-wide
shuffle, no Python in the loop.  At 100 TB each field scan is bounded
by the query terms' df exactly like the single-field path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import analyze_query
from .build import FtsIndex, build_index

K1 = 1.2
B = 0.75


@dataclass
class MultiFieldIndex:
    """Per-field indexes over one shared doc-id space."""

    fields: Dict[str, FtsIndex]

    def __post_init__(self) -> None:
        if not self.fields:
            raise ValueError("MultiFieldIndex needs at least one field")


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    fields: List[str],
    doc_id_col: str = "doc_id",
    term_buckets: Optional[int] = None,
) -> MultiFieldIndex:
    """Build one full-token index per field column of ``docs``.

    ``docs`` must carry ``doc_id_col`` plus one string column per entry
    of ``fields``.  Null field values index as empty text (the doc
    stays in that field's docstats with length 0, matching nothing).
    """
    missing = [f for f in fields if f not in docs.columns]
    if missing:
        raise ValueError(f"docs is missing field columns {missing}")
    built = {}
    for name in fields:
        fdocs = docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.coalesce(F.col(name), F.lit("")).alias("text"),
        )
        built[name] = build_index(
            spark, fdocs, ngrams=False, term_buckets=term_buckets
        )
    return MultiFieldIndex(built)


def _query_terms(text: str) -> List[str]:
    terms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in terms:
            terms.append(tok.term)
    return terms


def _weight_for(weights: Optional[dict], name: str) -> float:
    w = float((weights or {}).get(name, 1.0))
    if w < 0:
        raise ValueError(f"field weight for {name!r} must be >= 0, got {w}")
    return w


def _empty_scores(mf: MultiFieldIndex) -> DataFrame:
    any_idx = next(iter(mf.fields.values()))
    return (
        any_idx.docstats.select("doc_id")
        .withColumn("score", F.lit(0.0))
        .filter(F.lit(False))
    )


def bm25f_topk(
    mf: MultiFieldIndex,
    text: str,
    k: Optional[int] = 10,
    weights: Optional[dict] = None,
    field_b: Optional[dict] = None,
    k1: float = K1,
) -> DataFrame:
    """BM25F top-k -> (doc_id, score).

    For each field f with weight ``w_f`` and length parameter ``b_f``::

        tf~(t,d)  =  sum_f  w_f * tf_f / (1 - b_f + b_f * dl_f/avgdl_f)
        score(d)  =  sum_t  idf(t) * tf~ * (k1+1) / (k1 + tf~)

    with ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`` over the
    combined df (docs where t occurs in ANY field) — term frequencies
    are pooled BEFORE saturation, so two weak field matches reinforce
    instead of each saturating separately (the property that
    distinguishes BM25F from a per-field score sum; Zaragoza 2004).
    The ``(k1+1)`` factor keeps single-field BM25F at weight 1
    identical to :meth:`FtsEngine.bm25` (pinned by test).

    Plan: per field, a term-pruned postings scan joined to that
    field's docstats (broadcast |terms|-row side where applicable);
    one union; one (term, doc_id) partial-agg; a broadcast idf join;
    one doc_id partial-agg; TakeOrderedAndProject.
    """
    terms = _query_terms(text)
    if not terms:
        return _empty_scores(mf)
    per_field: List[DataFrame] = []
    members: List[DataFrame] = []
    n_docs = None
    for name, idx in mf.fields.items():
        w = _weight_for(weights, name)
        b = float((field_b or {}).get(name, B))
        if not (0.0 <= b <= 1.0):
            raise ValueError(f"field_b for {name!r} must be in [0,1], got {b}")
        if n_docs is None:
            n_docs = float(idx.n_docs)
        elif float(idx.n_docs) != n_docs:
            raise ValueError(
                "fields disagree on corpus size "
                f"({name}: {idx.n_docs} vs {n_docs}) — multi-field "
                "indexes must share one doc set"
            )
        matched = (
            idx.postings.filter(F.col("term").isin(terms) & (F.col("tf") > 0))
            .select("term", "doc_id", "tf")
        )
        members.append(matched.select("term", "doc_id"))
        if w == 0.0:
            continue  # contributes membership (df) but no score mass
        avgdl = float(idx.avgdl) or 1.0
        norm = 1.0 - b + b * F.col("doclen_tokens") / F.lit(avgdl)
        per_field.append(
            matched.join(
                idx.docstats.select("doc_id", "doclen_tokens"), "doc_id"
            ).select(
                "term",
                "doc_id",
                (F.lit(w) * F.col("tf") / norm).alias("wtf"),
            )
        )
    if not per_field:
        return _empty_scores(mf)
    pooled = per_field[0]
    for extra in per_field[1:]:
        pooled = pooled.unionByName(extra)
    pooled = pooled.groupBy("term", "doc_id").agg(F.sum("wtf").alias("wtf"))
    # combined df: docs where the term occurs in ANY field — bounded by
    # the query terms' df, never corpus-wide
    membership = members[0]
    for extra in members[1:]:
        membership = membership.unionByName(extra)
    df_tbl = (
        membership.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        pooled.join(F.broadcast(df_tbl), "term")
        .withColumn(
            "s",
            idf * F.col("wtf") * (k1 + 1.0) / (F.lit(float(k1)) + F.col("wtf")),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored


def _field_bm25(idx: FtsIndex, terms: List[str]) -> DataFrame:
    """Single-field BM25 (k1=1.2, b=0.75) -> (doc_id, score); the same
    formula/plan as FtsEngine.bm25's relational path, inlined so the
    per-field combinators don't need an FtsEngine per field."""
    n = float(idx.n_docs)
    avgdl = float(idx.avgdl) or 1.0
    matched = idx.postings.filter(
        F.col("term").isin(terms) & (F.col("tf") > 0)
    ).select("term", "doc_id", "tf")
    df_tbl = idx.termdict.filter(F.col("term").isin(terms)).select(
        "term", F.col("df_full").alias("df")
    )
    idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    return (
        matched.join(F.broadcast(df_tbl), "term")
        .join(idx.docstats.select("doc_id", "doclen_tokens"), "doc_id")
        .withColumn(
            "s",
            idf
            * F.col("tf")
            * (K1 + 1.0)
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("doclen_tokens") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )


def _combined_field_scores(
    mf: MultiFieldIndex, text: str, weights: Optional[dict]
) -> Optional[DataFrame]:
    """(doc_id, score) per field, weighted, unioned; None on empty query."""
    terms = _query_terms(text)
    if not terms:
        return None
    parts = []
    for name, idx in mf.fields.items():
        w = _weight_for(weights, name)
        if w == 0.0:
            continue
        parts.append(
            _field_bm25(idx, terms).select(
                "doc_id", (F.lit(w) * F.col("score")).alias("score")
            )
        )
    if not parts:
        return None
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


def dismax_topk(
    mf: MultiFieldIndex,
    text: str,
    k: Optional[int] = 10,
    weights: Optional[dict] = None,
    tie_breaker: float = 0.0,
) -> DataFrame:
    """best_fields ranking (Lucene DisjunctionMaxQuery shape):
    ``score = max_f(w_f * bm25_f) + tie_breaker * sum(others)`` —
    i.e. ``max + tie_breaker * (sum - max)``.  One union of the
    per-field score frames, one doc_id partial-agg computing max and
    sum together, TakeOrderedAndProject."""
    if not (0.0 <= tie_breaker <= 1.0):
        raise ValueError(f"tie_breaker must be in [0,1], got {tie_breaker}")
    union = _combined_field_scores(mf, text, weights)
    if union is None:
        return _empty_scores(mf)
    scored = (
        union.groupBy("doc_id")
        .agg(F.max("score").alias("mx"), F.sum("score").alias("sm"))
        .select(
            "doc_id",
            (
                F.col("mx")
                + F.lit(float(tie_breaker)) * (F.col("sm") - F.col("mx"))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored


def most_fields_topk(
    mf: MultiFieldIndex,
    text: str,
    k: Optional[int] = 10,
    weights: Optional[dict] = None,
) -> DataFrame:
    """most_fields ranking: ``score = sum_f(w_f * bm25_f)`` — each
    field scored with its own honest statistics, then summed (the ES
    multi_match most_fields shape)."""
    union = _combined_field_scores(mf, text, weights)
    if union is None:
        return _empty_scores(mf)
    scored = (
        union.groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored
