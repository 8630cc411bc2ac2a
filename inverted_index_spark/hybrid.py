"""Hybrid lexical + vector retrieval with reciprocal-rank fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009 — "Reciprocal Rank
Fusion outperforms Condorcet and individual rank learning methods"):

    rrf(d) = sum over retrieval lists L of 1 / (k_rrf + rank_L(d))

with the conventional k_rrf = 60. Documents missing from a list simply
contribute nothing for it (no imputed rank). RRF needs only ranks, not
score calibration, which is what makes it the standard way to fuse a
BM25 list with an embedding-similarity list whose score scales are
incomparable.

The reference engine has no vector side (it is a pure term index,
/root/reference/src/index.rs:15-20); this module is an engine
extension that composes two surfaces the repo already serves at scale:

- the lexical side is ``FtsEngine.bm25`` (WAND-routed, top-n pushdown,
  O(df) segment reads), and
- the vector side is a cosine top-n over an embeddings table
  (TakeOrderedAndProject, no shuffle; swap in ``lsh_search``/
  ``ivf_search`` for the ANN-pruned variant at scale).

Scale shape: each side arrives already truncated to ``n_each`` rows,
so ranking and the fusion join run on at most ``2 * n_each`` rows —
driver-scale work no matter the corpus size. The only corpus-sized
stages are the two retrievals themselves, which are the engine's
existing scale paths. The single-partition rank window below is
therefore deliberate: it never sees more than ``n_each`` rows.
"""

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_topn(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Truncate to the top-``n`` rows by (score desc, id asc) and
    attach dense 1..n ranks in that order.

    The truncation is a distributed TakeOrderedAndProject; only the
    surviving ≤ n rows pass through the (single-partition) rank
    window, so this is safe at any corpus size.
    """
    top = df.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.withColumn(rank_col, F.row_number().over(w))


def rrf_fuse(
    sides: Sequence[DataFrame],
    k: Optional[int] = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse N ranked lists by reciprocal-rank fusion.

    Each side must be a small, already-truncated DataFrame carrying
    ``id_col`` and an integer ``rank_col`` (1-based; produce one with
    :func:`ranked_topn`). Returns
    ``(id_col, rank_1..rank_N int, rrf double)`` ordered by
    (rrf desc, id asc), truncated to ``k`` when given. A document
    absent from side i has ``rank_i = 0`` (sentinel: "not retrieved")
    and contributes 0 to ``rrf``.
    """
    if not sides:
        raise ValueError("rrf_fuse needs at least one ranked side")
    if k_rrf <= 0:
        raise ValueError("k_rrf must be positive")
    fused = _fold_join(sides, id_col, rank_col, "rank", "int")
    rank_cols = [f"rank_{i}" for i in range(1, len(sides) + 1)]
    rrf = None
    for rc in rank_cols:
        term = F.when(
            F.col(rc).isNotNull(),
            F.lit(1.0) / (F.lit(k_rrf) + F.col(rc)),
        ).otherwise(F.lit(0.0))
        rrf = term if rrf is None else rrf + term
    out = fused.select(
        F.col("_id").alias(id_col),
        *[F.coalesce(F.col(rc), F.lit(0)).alias(rc) for rc in rank_cols],
        rrf.alias("rrf"),
    ).orderBy(F.desc("rrf"), F.asc(id_col))
    return out.limit(k) if k is not None else out


def _fold_join(
    sides: Sequence[DataFrame],
    id_col: str,
    in_col: str,
    out_prefix: str,
    cast: str,
) -> DataFrame:
    """Iterative full-outer-join fold shared by the fusion variants:
    each side's ``in_col`` lands as ``{out_prefix}_{i}`` keyed on a
    coalesced ``_id``. Inputs are pre-truncated top-n lists, so every
    join is over ≤ n rows per side."""
    fused = None
    for i, side in enumerate(sides, start=1):
        cur = side.select(
            F.col(id_col).alias("_id"),
            F.col(in_col).cast(cast).alias(f"{out_prefix}_{i}"),
        )
        if fused is None:
            fused = cur
        else:
            prev = fused
            cur_r = cur.withColumnRenamed("_id", "_id_r")
            fused = prev.join(
                cur_r, prev["_id"] == cur_r["_id_r"], "full_outer"
            ).select(
                F.coalesce(prev["_id"], cur_r["_id_r"]).alias("_id"),
                *[F.col(f"{out_prefix}_{j}") for j in range(1, i)],
                F.col(f"{out_prefix}_{i}"),
            )
    return fused


def normalized_topn(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n: int,
    norm_col: str = "nscore",
) -> DataFrame:
    """Truncate to the top-``n`` rows by (score desc, id asc) and
    min-max normalize the surviving scores to [0, 1] (all-equal
    scores normalize to 1.0). Same scale shape as :func:`ranked_topn`:
    the unbounded normalization window only ever sees ≤ n rows."""
    top = df.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)
    w = Window.partitionBy()
    lo, hi = F.min(score_col).over(w), F.max(score_col).over(w)
    norm = F.when(hi == lo, F.lit(1.0)).otherwise(
        (F.col(score_col) - lo) / (hi - lo)
    )
    return top.select(F.col(id_col), norm.alias(norm_col))


def weighted_fuse(
    sides: Sequence[DataFrame],
    weights: Sequence[float],
    k: Optional[int] = 10,
    id_col: str = "doc_id",
    norm_col: str = "nscore",
) -> DataFrame:
    """Convex (weighted-sum) fusion of min-max-normalized lists — the
    calibrated alternative to :func:`rrf_fuse` when score magnitudes
    should matter, not just ranks.

    Each side carries ``id_col`` and a [0, 1] ``norm_col`` (produce one
    with :func:`normalized_topn`). Returns
    ``(id_col, norm_1..norm_N double, wscore double)`` ordered by
    (wscore desc, id asc). A document absent from side i has
    ``norm_i = 0.0`` — indistinguishable from a present-but-minimum
    score, which is the semantics weighted fusion wants (zero
    evidence either way).
    """
    if not sides:
        raise ValueError("weighted_fuse needs at least one side")
    if len(weights) != len(sides):
        raise ValueError(
            f"got {len(sides)} sides but {len(weights)} weights"
        )
    if any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative")
    fused = _fold_join(sides, id_col, norm_col, "norm", "double")
    norm_cols = [f"norm_{i}" for i in range(1, len(sides) + 1)]
    score = None
    for w, nc in zip(weights, norm_cols):
        term = F.lit(float(w)) * F.coalesce(F.col(nc), F.lit(0.0))
        score = term if score is None else score + term
    out = fused.select(
        F.col("_id").alias(id_col),
        *[F.coalesce(F.col(nc), F.lit(0.0)).alias(nc) for nc in norm_cols],
        score.alias("wscore"),
    ).orderBy(F.desc("wscore"), F.asc(id_col))
    return out.limit(k) if k is not None else out


def hybrid_weighted_topk(
    engine,
    embeddings: DataFrame,
    query_text: str,
    query_vec: Sequence[float],
    alpha: float = 0.5,
    k: int = 10,
    n_each: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search with weighted score fusion: min-max-normalized
    BM25 top-``n_each`` and cosine top-``n_each`` combined as
    ``alpha * lex_norm + (1 - alpha) * vec_norm``. Returns
    ``(doc_id, lex_norm, vec_norm, wscore)`` ordered by
    (wscore desc, doc_id asc), limited to ``k``."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    from .pipelines.similarity import cosine_to_query

    lex = normalized_topn(
        engine.bm25(query_text, k=n_each).select("doc_id", "score"),
        "score",
        "doc_id",
        n_each,
    )
    vec = normalized_topn(
        cosine_to_query(embeddings, query_vec, id_col, vec_col),
        "cos",
        "vec_id",
        n_each,
    ).withColumnRenamed("vec_id", "doc_id")
    fused = weighted_fuse(
        [lex, vec], [alpha, 1.0 - alpha], k=k, id_col="doc_id"
    )
    return fused.select(
        "doc_id",
        F.col("norm_1").alias("lex_norm"),
        F.col("norm_2").alias("vec_norm"),
        "wscore",
    )


def hybrid_topk(
    engine,
    embeddings: DataFrame,
    query_text: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_each: int = 20,
    k_rrf: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search: BM25 top-``n_each`` fused with cosine
    top-``n_each`` by RRF.

    ``embeddings`` rows must share ids with the engine's doc store
    (``id_col`` == doc_id). Returns
    ``(doc_id, lex_rank int, vec_rank int, rrf double)`` ordered by
    (rrf desc, doc_id asc), limited to ``k``; a 0 rank means the doc
    was not in that side's top-``n_each``. Both sides rank by
    (score desc, id asc) at full float precision — the same cut their
    standalone top-k surfaces use.
    """
    from .pipelines.similarity import cosine_to_query

    lex = ranked_topn(
        engine.bm25(query_text, k=n_each).select("doc_id", "score"),
        "score",
        "doc_id",
        n_each,
    )
    vec = ranked_topn(
        cosine_to_query(embeddings, query_vec, id_col, vec_col),
        "cos",
        "vec_id",
        n_each,
    ).withColumnRenamed("vec_id", "doc_id")
    fused = rrf_fuse([lex, vec], k=k, k_rrf=k_rrf, id_col="doc_id")
    return fused.select(
        "doc_id",
        F.col("rank_1").alias("lex_rank"),
        F.col("rank_2").alias("vec_rank"),
        "rrf",
    )
