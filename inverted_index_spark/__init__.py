"""PySpark-native full-text indexing + BM25 search engine.

Rebuilds the capabilities of tikue/inverted_index (reference, Rust,
in-memory) as a distributed DataFrame-first engine: Arrow-batched
tokenization, parquet-backed postings with salted layout, compressed
doc-range segments with block-max metadata, a Match/And/Or/Phrase/Prefix
query compiler with reference-parity scoring, BM25 top-k (DataFrame and
block-max WAND paths), streaming ingestion, and training-data pipeline
operators (dedup, similarity/ANN, text stats, multimodal).

Quick start::

    from inverted_index_spark import (
        build_and_save, load_index, FtsEngine, Match, And, wand_topk,
    )
    idx = build_and_save(spark, docs_df, "/path/idx", ngrams=False)
    eng = FtsEngine(idx)
    eng.bm25("scan merge join", k=10).show()

See ARCHITECTURE.md for the full data flow.
"""

from .build import (  # noqa: F401
    FtsIndex,
    build_and_save,
    build_index,
    load_index,
    save_index,
    upsert_docs,
)
from .qast import (  # noqa: F401
    And,
    AndNot,
    AtLeast,
    Fuzzy,
    Match,
    Near,
    Or,
    Phonetic,
    Phrase,
    Prefix,
    Query,
    Regex,
    Wildcard,
)
from .query import FtsEngine  # noqa: F401
from .segments import build_segments, load_manifest, refresh_segments  # noqa: F401
from .session import get_spark  # noqa: F401
from .transcripts import (  # noqa: F401
    assign_doc_ids,
    conversation_having,
    conversation_topk,
    synthetic_transcripts,
    transcript_docs,
)
from .merge import merge_indexes  # noqa: F401
from .multifield import (  # noqa: F401
    MultiFieldIndex,
    bm25f_topk,
    build_multifield_index,
    dismax_topk,
    most_fields_topk,
)
from .upsert import (  # noqa: F401
    compact_index,
    delete_saved,
    load_index_merged,
    upsert_saved,
)
from .segquery import (  # noqa: F401
    explain_segment_query,
    segment_highlight,
    segment_highlight_pandas,
    segment_phrase,
    segment_query,
    segment_query_batch,
    segment_query_batch_pandas,
    min_window_pandas,
    segment_query_pandas,
    segment_search,
)
from .streaming import compact_stream, refresh_index  # noqa: F401
from .describe import describe_index  # noqa: F401
from .metacache import suggest_pandas  # noqa: F401
from .percolate import percolate  # noqa: F401
from .qparse import (  # noqa: F401
    QueryParseError,
    expand_synonyms,
    parse_query,
    render_query,
)
from .sqlapi import bm25_sql, register_index_views  # noqa: F401
from .wand import (  # noqa: F401
    explain_topk_pandas,
    score_topk_pandas,
    wand_topk,
    wand_topk_batch,
    wand_topk_batch_pandas,
    wand_topk_federated,
    wand_topk_pandas,
)

__all__ = [
    "FtsIndex",
    "FtsEngine",
    "Query",
    "Match",
    "And",
    "Or",
    "Phrase",
    "Prefix",
    "AndNot",
    "Near",
    "Fuzzy",
    "Wildcard",
    "Regex",
    "AtLeast",
    "build_index",
    "build_and_save",
    "save_index",
    "load_index",
    "upsert_docs",
    "upsert_saved",
    "compact_index",
    "load_index_merged",
    "build_segments",
    "refresh_segments",
    "load_manifest",
    "wand_topk",
    "wand_topk_batch",
    "score_topk_pandas",
    "wand_topk_pandas",
    "wand_topk_batch_pandas",
    "explain_topk_pandas",
    "segment_search",
    "parse_query",
    "render_query",
    "expand_synonyms",
    "percolate",
    "suggest_pandas",
    "QueryParseError",
    "explain_segment_query",
    "describe_index",
    "segment_query",
    "segment_query_batch",
    "segment_query_pandas",
    "min_window_pandas",
    "segment_query_batch_pandas",
    "segment_phrase",
    "segment_highlight",
    "segment_highlight_pandas",
    "register_index_views",
    "bm25_sql",
    "compact_stream",
    "refresh_index",
    "get_spark",
    "assign_doc_ids",
    "synthetic_transcripts",
    "transcript_docs",
    "conversation_having",
    "MultiFieldIndex",
    "build_multifield_index",
    "bm25f_topk",
    "dismax_topk",
    "most_fields_topk",
]
