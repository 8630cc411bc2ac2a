"""Spark SQL surface over the index tables.

The engine is DataFrame-first, but the same tables are plain relations —
registering them as temp views lets users (and BI/SQL tooling) query the
index with ``spark.sql``. ``bm25_sql`` generates the exact BM25 query
the DataFrame path executes (query.py FtsEngine.bm25: k1=1.2, b=0.75,
idf = ln((N - df + 0.5)/(df + 0.5) + 1)), so both surfaces return the
same ranking — asserted in tests/test_sqlapi.py.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import SparkSession

from .analysis import analyze_query
from .build import FtsIndex

K1 = 1.2
B = 0.75


def register_index_views(
    spark: SparkSession, index: FtsIndex, prefix: str = "fts"
) -> None:
    """Expose the index as temp views ``<prefix>_postings``,
    ``<prefix>_docstats``, ``<prefix>_termdict`` (and ``<prefix>_docs``
    when the index carries a doc store)."""
    index.postings.createOrReplaceTempView(f"{prefix}_postings")
    index.docstats.createOrReplaceTempView(f"{prefix}_docstats")
    index.termdict.createOrReplaceTempView(f"{prefix}_termdict")
    if index.docs is not None:
        index.docs.createOrReplaceTempView(f"{prefix}_docs")


def analyze_terms(text: str) -> List[str]:
    """Query-analyzer terms (lowercased full tokens, deduped, ordered)."""
    out: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in out:
            out.append(tok.term)
    return out


def bm25_sql(
    index: FtsIndex,
    text: str,
    k: int = 10,
    prefix: str = "fts",
) -> Optional[str]:
    """ANSI-SQL BM25 top-k over the registered views — identical math
    to ``FtsEngine.bm25``. Returns None for an empty analyzed query."""
    terms = analyze_terms(text)
    if not terms:
        return None
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    n = float(index.n_docs)
    avgdl = float(index.avgdl)
    return f"""
        WITH q AS (
          SELECT p.term, p.doc_id, CAST(p.tf AS DOUBLE) AS tf
          FROM {prefix}_postings p
          WHERE p.term IN ({in_list}) AND p.tf > 0
        ),
        d AS (
          SELECT term, CAST(df_full AS DOUBLE) AS df
          FROM {prefix}_termdict WHERE term IN ({in_list})
        )
        SELECT q.doc_id,
               SUM( LN(({n} - d.df + 0.5) / (d.df + 0.5) + 1.0)
                    * q.tf * {K1 + 1.0}
                    / (q.tf + {K1} * (1.0 - {B} + {B} * s.doclen_tokens / {avgdl}))
                  ) AS score
        FROM q
        JOIN d USING (term)
        JOIN {prefix}_docstats s ON s.doc_id = q.doc_id
        GROUP BY q.doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT {int(k)}
    """


def suggest_sql(
    text: str,
    max_edits: int = 2,
    k: int = 3,
    prefix: str = "fts",
) -> Optional[str]:
    """ANSI-SQL did-you-mean over the registered termdict view —
    identical ranking to ``FtsEngine.suggest`` ((dist asc, df desc,
    term asc) per analyzed query term, Spark's built-in ``levenshtein``
    == ``F.levenshtein``). Returns None for an empty analyzed query."""
    terms = analyze_terms(text)
    if not terms:
        return None
    qrows = " UNION ALL ".join(
        "SELECT '" + t.replace("'", "''") + "' AS qterm" for t in terms
    )
    return f"""
        WITH q AS ({qrows}),
        cand AS (
          SELECT q.qterm, d.term AS suggestion,
                 levenshtein(d.term, q.qterm) AS dist,
                 d.df_full AS df
          FROM {prefix}_termdict d CROSS JOIN q
          WHERE d.df_full > 0
            AND levenshtein(d.term, q.qterm) <= {int(max_edits)}
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY qterm
                   ORDER BY dist ASC, df DESC, suggestion ASC
                 ) AS rank
          FROM cand
        )
        SELECT qterm, suggestion, dist, df, rank
        FROM r WHERE rank <= {int(k)}
        ORDER BY qterm ASC, rank ASC
    """


def significant_terms_sql(
    index: FtsIndex,
    text: str,
    k: int = 20,
    min_doc_count: int = 3,
    prefix: str = "fts",
) -> Optional[str]:
    """ANSI-SQL JLH significant terms for a ``Match(text)`` foreground —
    identical math to ``FtsEngine.significant_terms`` (foreground docs
    are the Match prefix-expansion's membership; term ranges mirror the
    engine's sargable [t, succ(t)) scans). Returns None for an empty
    analyzed query."""
    from .query import prefix_upper_bound

    terms = analyze_terms(text)
    if not terms:
        return None
    preds = []
    for t in terms:
        lit = t.replace("'", "''")
        hi = prefix_upper_bound(t)
        if hi is None:
            preds.append(f"term >= '{lit}'")
        else:
            preds.append(
                f"(term >= '{lit}' AND term < '{hi.replace(chr(39), chr(39) * 2)}')"
            )
    member = " OR ".join(preds)
    n = float(index.n_docs)
    return f"""
        WITH fg AS (
          SELECT DISTINCT doc_id FROM {prefix}_postings
          WHERE {member}
        ),
        fgn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM fg),
        fgdf AS (
          SELECT p.term, COUNT(*) AS fg_df
          FROM {prefix}_postings p
          JOIN fg ON fg.doc_id = p.doc_id
          WHERE p.tf > 0
          GROUP BY p.term
          HAVING COUNT(*) >= {int(min_doc_count)}
        )
        SELECT f.term, f.fg_df, d.df_full AS bg_df,
               ((f.fg_df / fgn.n) - (d.df_full / {n}))
               * ((f.fg_df / fgn.n) / (d.df_full / {n})) AS score
        FROM fgdf f
        JOIN {prefix}_termdict d ON d.term = f.term
        CROSS JOIN fgn
        ORDER BY score DESC, term ASC
        LIMIT {int(k)}
    """
