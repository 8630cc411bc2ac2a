"""Text-analysis pipeline operators over a documents table.

Large-scale training-data prep primitives: per-document statistics,
quality scoring, language ID, fingerprinting, token/term frequency
tables. All JVM-side (built-in functions only) except tokenization,
which reuses the engine's Arrow-batched tokenizer for exact parity with
the index build.

Every function takes/returns DataFrames and scales linearly: narrow maps
plus one aggregation, no joins, no skew-prone keys (doc_id grouping).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..build import tokenize_docs

# Tiny deterministic stopword lists for n-gram/stopword language ID.
# Heuristic quality only — the point is the distributed plumbing and a
# deterministic, SQL-mirrorable formula.
LANG_STOPWORDS = {
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "ist", "nicht"],
    "en": ["the", "of", "and", "to", "in", "is", "you", "that", "it", "for"],
    "es": ["de", "la", "que", "el", "en", "los", "se", "del", "las", "por"],
    "fr": ["de", "la", "le", "et", "les", "des", "en", "un", "du", "une"],
}


def doc_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, doclen_bytes, doclen_tokens) — corpus statistics feeding
    BM25 normalization (avgdl) and quality filters."""
    toks = tokenize_docs(docs, ngrams=False)
    return (
        docs.select("doc_id", F.octet_length("text").alias("doclen_bytes"))
        .join(
            toks.groupBy("doc_id").agg(
                F.count("*").cast("bigint").alias("doclen_tokens")
            ),
            "doc_id",
            "left",
        )
        .fillna({"doclen_tokens": 0})
    )


def term_tf(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) over full tokens — the raw postings feed."""
    return (
        tokenize_docs(docs, ngrams=False)
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def term_df(docs: DataFrame) -> DataFrame:
    """(term, df) document frequency over full tokens."""
    return (
        tokenize_docs(docs, ngrams=False)
        .select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )


def term_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, term, pos) — exploded token stream with ordinals."""
    return tokenize_docs(docs, ngrams=False).select("doc_id", "term", "pos")


def normalize_text(
    docs: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """Ingest text hygiene: Unicode-normalize (NFC default), strip
    control characters, collapse whitespace runs, trim.

    The canonical pre-dedup normalization step — MinHash/SimHash/exact
    dedup all treat 'e\\u0301' vs '\\u00e9' or stray control bytes as
    different documents unless the corpus is normalized first.

    Rules (each dialect-stable so the DuckDB oracle mirrors exactly):

    1. ``unicodedata.normalize(form, s)`` — DuckDB ``nfc_normalize``
       implements the same Unicode NFC;
    2. strip non-whitespace control chars ``[\\x00-\\x08\\x0e-\\x1f
       \\x7f]`` (tab/newline/CR/FF/VT survive into rule 3);
    3. collapse ``[ \\t\\n\\r\\f\\x0b]+`` runs to one space — the
       EXPLICIT ASCII class, not ``\\s`` (Python ``\\s`` is
       Unicode-aware, RE2/Java ``\\s`` are not — an explicit class is
       the dialect-stable subset);
    4. strip leading/trailing spaces.

    Unicode normalization has no Spark builtin, so this is an
    Arrow-batched pandas UDF — a narrow map, no shuffle, scales
    linearly. Nulls pass through as nulls. Returns ``docs`` with
    ``text_col`` replaced.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    import re as _re

    ctrl = _re.compile("[\x00-\x08\x0e-\x1f\x7f]")
    ws = _re.compile("[ \t\n\r\f\x0b]+")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, t)
            t = ctrl.sub("", t)
            return ws.sub(" ", t).strip(" ")

        return s.map(one)

    return docs.withColumn(text_col, _norm(F.col(text_col)))


def quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: token count, distinct-token ratio,
    mean token length (chars). Rounded for cross-engine comparison."""
    toks = tokenize_docs(docs, ngrams=False)
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.countDistinct("term").cast("bigint").alias("n_distinct"),
            F.round(F.avg(F.length("term")), 4).alias("mean_token_len"),
        )
        .withColumn(
            "distinct_ratio",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4),
        )
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — md5 content fingerprint (stable across engines)."""
    return docs.select("doc_id", F.md5(F.col("text")).alias("fp"))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace vs BPE-ish counts.

    ``ws_tokens``: whitespace-split count. ``bpe_tokens``: count of
    matches of a GPT-style pre-tokenizer regex (word / number-chunk /
    punctuation-run / whitespace-run pieces) — a deterministic proxy for
    subword token counts used to budget training data. Both stay
    JVM-side (regexp over the text column, no UDF).
    """
    # GPT-2-style pretokenizer classes, simplified to a POSIX-safe form:
    # letter runs (with leading space), digit runs, punctuation runs
    bpe_re = r"[ ]?[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+|\s+"
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(bpe_re), 0))
        .cast("bigint")
        .alias("bpe_tokens"),
    )


def repetition(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, n_shingles, dup_shingle_ratio, top_shingle_ratio):
    Gopher-style repetition filters — documents dominated by repeated
    word n-grams (boilerplate, keyword spam, template junk) show a high
    duplicate-shingle fraction and/or one shingle owning a large share.

    All JVM-side: non-distinct k-shingle explode, one (doc, shingle)
    groupBy, one per-doc aggregate. Docs shorter than ``k`` tokens get
    n_shingles=0 and 0.0 ratios (nothing to repeat).
    """
    # token array projected once: no CSE inside HOF lambdas, so
    # slicing split(text) directly re-splits per shingle (O(n^2))
    toks = F.col("_toks")
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
        .select("doc_id", F.explode(sh).alias("shingle"))
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("cnt"))
    )
    stats = per.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_shingles"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        docs.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce(
                F.round(1 - F.col("n_distinct") / F.col("n_shingles"), 4),
                F.lit(0.0),
            ).alias("dup_shingle_ratio"),
            F.coalesce(
                F.round(F.col("max_cnt") / F.col("n_shingles"), 4), F.lit(0.0)
            ).alias("top_shingle_ratio"),
        )
    )


def pattern_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_urls, n_digit_runs): per-doc counts of
    PII-ish / markup-ish patterns used as quality and redaction signals
    in training-data pipelines. Pure regexp over the text column (no
    UDF); patterns stay in the POSIX-compatible subset both Java regex
    and RE2 evaluate identically.
    """
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url = r"https?://[^\s]+"
    digits = r"[0-9]+"
    def n(pat):
        return F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast(
            "bigint"
        )
    return docs.select(
        "doc_id",
        n(email).alias("n_emails"),
        n(url).alias("n_urls"),
        n(digits).alias("n_digit_runs"),
    )


def rolling_fingerprint(docs: DataFrame, window: int = 8) -> DataFrame:
    """(doc_id, fp) — winnowing-style rolling-hash fingerprint.

    Karp-Rabin over word ids: each ``window``-word span gets
    ``md5(span)``; the document fingerprint is the minimum span hash
    (the winnowing selection with one global window), falling back to
    md5(text) for docs shorter than the window. Shift-resistant — unlike
    ``fingerprint`` (exact md5), a doc that shares any w-word stretch
    with another can be bucketed with it. All JVM-side.
    """
    # token array projected once: no CSE inside HOF lambdas, so
    # slicing split(text) directly re-splits per window (O(n^2))
    toks = F.col("_toks")
    spans = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (window - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
        ),
    ).otherwise(F.array(F.md5(F.col("text"))))
    return docs.select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("_toks")
    ).select("doc_id", F.array_min(spans).alias("fp"))


def langid(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language ID: hits per language list, argmax with
    lexicographic tie-break. Deterministic and SQL-mirrorable."""
    toks = tokenize_docs(docs, ngrams=False)
    agg = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term").isin(words), 1).otherwise(0)).alias(
                f"hits_{lang}"
            )
            for lang, words in sorted(LANG_STOPWORDS.items())
        ]
    )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order so earlier language wins ties (lexicographic argmax)
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), lang
        ).otherwise(pred)
    return agg.select("doc_id", pred.alias("lang_pred"))


# Lucene's classic English stopword set (StopAnalyzer.ENGLISH_STOP_WORDS_SET)
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]


def s_stem_py(t: str) -> str:
    """Harman (1991) S-stemmer — the three-suffix-rule English
    'light' stemmer. Apply the FIRST matching rule:

    1. ``...ies`` (but not ``eies``/``aies``) -> ``...y``
    2. ``...es``  (but not ``aes``/``ees``/``oes``) -> drop the ``s``
    3. ``...s``   (but not ``us``/``ss``) -> drop the ``s``

    Chosen over Porter because every rule is a plain suffix test —
    bit-identical to express in Spark SQL, DuckDB SQL and Python (no
    regex dialects, no measure conditions), so the index transform is
    exactly oracle-able. Pure function of the token; the Spark twin is
    :func:`stem_filter`'s in-plan CASE expression.
    """
    if t.endswith("ies") and not (t.endswith("eies") or t.endswith("aies")):
        return t[:-3] + "y"
    if t.endswith("es") and not (
        t.endswith("aes") or t.endswith("ees") or t.endswith("oes")
    ):
        return t[:-1]
    if t.endswith("s") and not (t.endswith("us") or t.endswith("ss")):
        return t[:-1]
    return t


def _s_stem_col(t):
    """The S-stemmer as a Spark Column expression over one token."""
    n = F.length(t)
    e3, e4 = F.substring(t, -3, 3), F.substring(t, -4, 4)
    e1, e2 = F.substring(t, -1, 1), F.substring(t, -2, 2)
    return (
        F.when(
            (e3 == "ies") & ~e4.isin("eies", "aies"),
            F.concat(F.substring(t, 1, n - 3), F.lit("y")),
        )
        .when(
            (e2 == "es") & ~e3.isin("aes", "ees", "oes"),
            F.substring(t, 1, n - 1),
        )
        .when(
            (e1 == "s") & ~e2.isin("us", "ss"),
            F.substring(t, 1, n - 1),
        )
        .otherwise(t)
    )


def stem_filter(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    stem: bool = True,
) -> DataFrame:
    """Index-time token normalization as a CORPUS TRANSFORM (the
    Spark-first shape: analysis beyond the reference's chain runs as a
    narrow map over the lakehouse table BEFORE indexing, so the engine
    and its oracles stay unchanged): lowercase, split on spaces, drop
    ``stopwords`` (default Lucene's classic English set), S-stem each
    survivor (:func:`s_stem_py`), re-join with single spaces.

    Everything is built-in JVM expressions (`split`/`filter`/
    `transform`/`array_join`) — one narrow projection, no shuffle, no
    Python. Query side: apply :func:`s_stem_py` to the query terms
    (after the same stopword drop) before searching the stemmed index;
    matching then conflates plural/singular exactly like a Lucene
    ``StopFilter`` + ``EnglishMinimalStemFilter`` chain.
    """
    stops = EN_STOPWORDS if stopwords is None else list(stopwords)
    toks = F.split(F.lower(F.col(text_col)), " ")
    if stops:
        toks = F.filter(toks, lambda t: ~t.isin(*stops))
    if stem:
        toks = F.transform(toks, _s_stem_col)
    # rule 3 can stem a bare "s" to "" — drop empties so the re-joined
    # text stays cleanly space-tokenizable
    toks = F.filter(toks, lambda t: t != "")
    out = F.array_join(toks, " ")
    return docs.withColumn(text_col, out)


def stem_query_text(text: str, stopwords: list[str] | None = None,
                    stem: bool = True) -> str:
    """Query-side twin of :func:`stem_filter` (pure Python, driver):
    lowercase, drop stopwords, S-stem, re-join."""
    stops = set(EN_STOPWORDS if stopwords is None else stopwords)
    toks = [t for t in text.lower().split(" ") if t and t not in stops]
    if stem:
        toks = [s_stem_py(t) for t in toks]
    return " ".join(t for t in toks if t)


def cooccurrence(
    docs: DataFrame,
    window: int = 5,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Windowed term co-occurrence with PMI -> (term_a, term_b, n,
    pmi: double), term_a < term_b, ordered by (term_a, term_b).

    The distributional-semantics / collocation-mining primitive
    ("which tokens keep appearing near 'error'?"): a co-occurrence
    EVENT is an unordered pair of UNEQUAL tokens at positions (i, j)
    of one doc with 0 < j - i <= ``window``. PMI is computed over the
    pair-event space: with T total events and m_x = events containing
    x on either side, ``pmi = ln(n_ab * T / (m_a * m_b))``.
    ``min_count`` filters the OUTPUT rows (marginals and T are always
    computed over all events, so reported PMIs are unbiased by the
    cutoff).

    Scale shape: pair generation is a pure in-plan array expression —
    per doc, ``transform`` over token indices emits each index's
    ≤``window`` forward neighbors (flatten, one narrow map, no
    positional self-join, no Python); then one (a, b) partial-agg
    count, a term-marginal partial agg over the pair table, and two
    broadcast-sized joins on the term marginals. Work is
    O(tokens x window) map-side — the same event count a self-join
    would shuffle, generated without the shuffle.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # Materialize the token array ONCE per row before the pair
    # expression. Inside higher-order-function lambdas Catalyst does
    # NOT common-subexpression-eliminate, so referencing
    # split(text) directly would re-split the row for every
    # element_at/slice — O(tokens^2) splits per doc (measured ~5x on
    # the bench corpus). A column reference makes each access O(1).
    toks = F.col("_toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)))
    pair_structs = F.flatten(
        F.transform(
            idx,
            lambda i: F.filter(
                F.transform(
                    F.slice(toks, i + 2, window),
                    lambda t: F.struct(
                        F.least(F.element_at(toks, i + 1), t).alias("a"),
                        F.greatest(F.element_at(toks, i + 1), t).alias("b"),
                    ),
                ),
                lambda p: p["a"] != p["b"],
            ),
        )
    )
    events = (
        docs.filter(F.length(text_col) > 0)
        .select(F.split(F.col(text_col), " ").alias("_toks"))
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    # everything below derives from the aggregated pair table — the
    # corpus-sized event stream is scanned exactly once per action
    # (the marginal/total branches re-reference the same pair
    # aggregation, which ReuseExchange dedupes) and marginals/total
    # cost O(distinct pairs), not O(events)
    pair_counts = events.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    marginals = (
        pair_counts.select(F.col("a").alias("t"), "n")
        .unionAll(pair_counts.select(F.col("b").alias("t"), "n"))
        .groupBy("t")
        .agg(F.sum("n").cast("bigint").alias("m"))
    )
    # T rides a broadcast 1-row cross join instead of a driver
    # collect: no extra Spark job, no second corpus scan
    total = pair_counts.agg(F.sum("n").cast("double").alias("_tt"))
    return (
        pair_counts.filter(F.col("n") >= min_count)
        .join(marginals.withColumnRenamed("t", "a").withColumnRenamed("m", "m_a"), "a")
        .join(marginals.withColumnRenamed("t", "b").withColumnRenamed("m", "m_b"), "b")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            "n",
            F.log(
                F.col("n").cast("double")
                * F.col("_tt")
                / (F.col("m_a") * F.col("m_b"))
            ).alias("pmi"),
        )
        .orderBy("term_a", "term_b")
    )


def lm_score(
    docs: DataFrame, alpha: float = 0.5, broadcast_vocab: bool = True
) -> DataFrame:
    """Unigram-LM perplexity scoring (the CCNet / Wikipedia-LM quality
    signal): fit a Lidstone-smoothed unigram language model on the
    corpus itself, then score every document by its cross-entropy under
    that model -> (doc_id, n_tokens, cross_entropy, perplexity).

    Training pipelines rank/filter web text by LM perplexity — low
    perplexity means the document looks like the reference corpus,
    extreme values flag gibberish (high) or degenerate repetition
    (low). This is the distribution-level complement to the per-doc
    ``quality``/``repetition`` heuristics. Model:

        P(t) = (c_t + alpha) / (T + alpha * V)
        cross_entropy(d) = -(1/|d|) * sum_{t in d} ln P(t)
        perplexity(d)    = exp(cross_entropy(d))

    with c_t the corpus count of term t, T total tokens, V vocabulary
    size. Whitespace tokens (matching ``token_counts.ws_tokens``), all
    arithmetic in float64 natural log — every step reproduces exactly
    in any SQL engine (the oracle recomputes it end-to-end).

    Scale: token events are compressed to (doc_id, term, tf) FIRST, so
    the vocab join touches distinct pairs, not occurrences; the model
    table is vocab-sized and broadcast by default (hot terms like
    "the" then never shuffle — pass ``broadcast_vocab=False`` when the
    vocabulary exceeds executor memory and let AQE's skew handling
    take the sort-merge join). T and V ride a broadcast 1-row cross
    join. Nothing here is corpus-quadratic.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    counts = tf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("c"))
    totals = counts.agg(
        F.sum("c").cast("double").alias("big_t"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.log(
            (F.col("c").cast("double") + F.lit(float(alpha)))
            / (F.col("big_t") + F.lit(float(alpha)) * F.col("v"))
        ).alias("logp"),
    )
    model = F.broadcast(probs) if broadcast_vocab else probs
    per_doc = (
        tf.join(model, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (
                -F.sum(F.col("tf").cast("double") * F.col("logp"))
                / F.sum(F.col("tf").cast("double"))
            ).alias("cross_entropy"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "cross_entropy",
        F.exp(F.col("cross_entropy")).alias("perplexity"),
    )


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Span-level PII redaction: rewrite ``text_col`` with emails ->
    ``<EMAIL>``, URLs -> ``<URL>``, and long digit runs (6+, the
    phone/ID shapes) -> ``<NUM>``, all other columns untouched — the
    mutation twin of :func:`pattern_counts` (which only counts).

    Order is load-bearing: URLs are rewritten FIRST so an email-shaped
    substring inside a URL (``http://user@host.com/...``) is swallowed
    by ``<URL>`` rather than half-redacted; digit runs go last so runs
    inside emails/URLs are already gone. Patterns stay in the
    POSIX-compatible subset Java regex and RE2 evaluate identically
    (the same family ``pattern_counts`` uses), so the oracle reproduces
    the rewrite byte-for-byte. Three JVM-side ``regexp_replace`` calls,
    one narrow projection — no UDF, no shuffle, linear scan.
    """
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url = r"https?://[^\s]+"
    digits = r"[0-9]{6,}"
    out = F.regexp_replace(F.col(text_col), url, "<URL>")
    out = F.regexp_replace(out, email, "<EMAIL>")
    out = F.regexp_replace(out, digits, "<NUM>")
    return docs.withColumn(text_col, out)


def hashed_tfidf(
    docs: DataFrame, dim: int = 1024, text_col: str = "text"
) -> DataFrame:
    """Hashing-trick TF-IDF document vectors in LONG form ->
    (doc_id, bucket, w) — the classic text featurizer (HashingTF +
    IDF) for classifiers, clustering and cheap similarity, with every
    step reproducible bit-for-bit in any SQL engine.

    Terms hash to ``bucket = first-8-hex(md5(term)) mod dim`` (md5, not
    an engine-native hash, so the oracle and any future engine agree);
    colliding terms pool their tf, exactly like HashingTF. Weights are
    the sklearn-style smoothed TF-IDF

        w = tf * (ln((N + 1) / (df_b + 1)) + 1)

    with ``df_b`` the DOCUMENT frequency of the bucket (collisions pool
    df too — the standard hashing-trick tradeoff) and ``N`` the number
    of docs with at least one token. Long form keeps the output sparse
    and shuffle-bounded (|doc x distinct-bucket| rows); pivot to dense
    arrays only at consumption time (``kmeans`` accepts either after a
    ``collect_list`` repack).

    Scale: one token explode, one (doc, bucket) partial agg, one
    bucket-df partial agg (vocab-bounded, broadcast into the weight
    join), N on a broadcast 1-row cross join. No UDFs, no skew keys
    (buckets are uniform by construction).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ", -1)).alias("term")
    )
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint")
        % F.lit(dim)
    ).alias("bucket")
    events = toks.select("doc_id", bucket)
    tf = events.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    # df and N derive from the AGGREGATED tf table (its rows are
    # already distinct (doc, bucket) pairs), so every branch reuses
    # tf's shuffle exchange instead of re-scanning and re-hashing the
    # token stream
    df_b = tf.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    n = tf.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    return (
        tf.join(F.broadcast(df_b), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "bucket",
            (
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("w"),
        )
    )


def domain_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-domain corpus statistics -> one row per URL host seen in the
    corpus: (domain, n_docs: bigint distinct docs mentioning it,
    n_urls: bigint total URL occurrences), domain-sorted.

    The C4/RefinedWeb per-domain curation primitive: domain blocklists,
    per-domain caps ("at most N pages per site") and domain-level
    quality priors all start from this table. Domains are the host
    part of every ``http(s)://`` URL in the text, lowercased; the
    extraction pattern stays in the POSIX-compatible subset Java regex
    and RE2 evaluate identically (the :func:`pattern_counts` /
    :func:`redact` family), so an oracle reproduces the table exactly.

    Scale shape: one in-plan ``regexp_extract_all`` (JVM, no UDF) over
    the corpus, one explode of the per-doc URL list (output rows =
    URL occurrences, typically << tokens), then two partial aggs:
    (domain, doc) distinct -> n_docs, and a plain count -> n_urls. A
    mega-domain is one partial-agg group, never a sort partition —
    combinable all the way down, nothing corpus-quadratic.
    """
    url_host = r"https?://([A-Za-z0-9.-]+)"
    hosts = docs.select(
        F.col("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(url_host), F.lit(1))
        ).alias("host"),
    ).select("doc_id", F.lower(F.col("host")).alias("domain"))
    per_doc = hosts.select("domain", "doc_id").distinct()
    n_docs = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    n_urls = hosts.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls")
    )
    return n_docs.join(n_urls, "domain").orderBy("domain")
