"""Reverse search (Elasticsearch percolator analog): match a BATCH of
documents against a registered set of stored queries.

Forward search asks "which docs match this query"; percolation asks
"which of my registered queries match this doc" — the alerting /
routing / saved-search primitive (ES percolate query; Lucene MemoryIndex
per doc). Engine EXTENSION: the reference (tikue/inverted_index) has no
reverse path, but its single-doc index semantics (src/index.rs:62-129)
are exactly what evaluating one document against a query requires, so
the per-doc matcher here reuses the pure-Python reference oracle
(`oracle.OracleIndex`) — percolation answers are BY CONSTRUCTION the
reference's answers, and therefore the Spark engine's (the engine is
fuzz-pinned against the same oracle).

Scale shape: queries are a driver-bounded registry (broadcast with the
closure — same envelope as WAND's term lists); documents are the
distributed axis. One mapInPandas pass evaluates every registered query
per doc with NO shuffle at all — output is a (doc row, query_id) match
list, cost O(docs/partition x queries), embarrassingly parallel, and a
streaming micro-batch can call this inside foreachBatch unchanged.
Python-side per-doc evaluation is the honest trade: a single doc's
index is tiny (the reference builds it in-memory too), Arrow batching
amortizes the transfer, and there is no JVM expression for "build an
index of one row and run a recursive query AST over it".
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from pyspark.sql import DataFrame

from .qast import Query

QueryRegistry = Union[Dict[str, Query], Sequence[Tuple[str, Query]]]


def _registry_items(queries: QueryRegistry) -> List[Tuple[str, Query]]:
    if isinstance(queries, dict):
        return list(queries.items())
    return list(queries)


def percolate(
    docs: DataFrame,
    queries: QueryRegistry,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Match every row of ``docs`` against every registered query.

    Returns (``id_col``, query_id) — one row per (doc, matching query),
    membership only (no scores/positions: alerting wants the match set;
    run the forward engine on the matched doc for anything richer).

    ``queries``: {query_id: Query AST} (or (id, ast) pairs), evaluated
    with the reference's Match/And/Or/Phrase/Prefix semantics plus the
    engine extensions (AndNot/Near/Fuzzy/Wildcard/Regex/AtLeast — Fuzzy
    expands against the SINGLE doc's vocabulary, the one-doc analog of
    dictionary expansion). Match is prefix-matching, exactly as it is
    in BOTH engine index modes (stored edge-ngrams on parity indexes,
    query-time range expansion on full-token ones), so percolation
    membership equals ``FtsEngine.results(ast)`` membership per doc.
    """
    items = _registry_items(queries)
    if not items:
        out_schema = f"{id_col} long, query_id string"
        return docs.sparkSession.createDataFrame([], out_schema)
    out_schema = f"{id_col} long, query_id string"

    def matcher(batches):
        # absolute import inside: the closure is cloudpickled by value
        # to executors, where the shipped package resolves it
        from inverted_index_spark.oracle import OracleIndex

        for pdf in batches:
            ids: List[int] = []
            qids: List[str] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                one = OracleIndex()
                one.add(0, text if text is not None else "")
                for qid, ast in items:
                    if one.postings_for(ast):
                        ids.append(int(doc_id))
                        qids.append(qid)
            import pandas as pd

            yield pd.DataFrame({id_col: ids, "query_id": qids})

    return docs.select(id_col, text_col).mapInPandas(matcher, out_schema)
