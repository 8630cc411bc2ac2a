"""Training-data pipeline operators: dedup, similarity/ANN, text
quality, corpus management, event windows. Multimodal ops stay under
``pipelines.multimodal`` (imported lazily — their decode kernels are
environment-dependent)."""

from .corpus import (  # noqa: F401
    corpus_split,
    decontaminate,
    ngram_contamination,
    pack_sequences,
    stratified_sample,
)
from .dedup import (  # noqa: F401
    build_dedup_index,
    dedup_corpus,
    extend_dedup_index,
    incremental_near_dup_pairs,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_clusters,
    near_dup_pairs,
    ngram_jaccard_pairs,
    save_dedup_index,
    simhash,
    simhash_pairs,
    with_text_hash,
)
from .events import sessionize, session_spans, tumbling_counts  # noqa: F401
from .events_stream import (  # noqa: F401
    stream_session_spans,
    stream_sessionize,
    stream_tumbling_counts,
)
from .similarity import (  # noqa: F401
    build_ivf,
    build_lsh,
    cosine_topk,
    ivf_search,
    knn_join,
    load_ivf,
    load_lsh,
    lsh_search,
    neardup_pairs_cosine,
    save_ivf,
    save_lsh,
)
from .textstats import (  # noqa: F401
    EN_STOPWORDS,
    fingerprint,
    langid,
    pattern_counts,
    quality,
    repetition,
    rolling_fingerprint,
    s_stem_py,
    stem_filter,
    stem_query_text,
    token_counts,
)

__all__ = [
    "with_text_hash", "minhash_signatures", "lsh_candidate_pairs",
    "near_dup_pairs", "near_dup_clusters", "dedup_corpus",
    "ngram_jaccard_pairs", "jaccard_verify_pairs", "simhash",
    "simhash_pairs", "build_dedup_index", "save_dedup_index",
    "extend_dedup_index", "incremental_near_dup_pairs",
    "cosine_topk", "knn_join", "neardup_pairs_cosine",
    "build_lsh", "save_lsh", "load_lsh", "lsh_search",
    "build_ivf", "save_ivf", "load_ivf", "ivf_search",
    "quality", "repetition", "pattern_counts", "token_counts",
    "langid", "fingerprint", "rolling_fingerprint",
    "stem_filter", "stem_query_text", "s_stem_py", "EN_STOPWORDS",
    "ngram_contamination", "decontaminate", "corpus_split",
    "stratified_sample", "pack_sequences",
    "sessionize", "session_spans", "tumbling_counts",
    "stream_tumbling_counts", "stream_session_spans", "stream_sessionize",
]
