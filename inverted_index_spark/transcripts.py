"""Transcript corpus: the engine's canonical input table.

Per ``BASELINE.json`` ``input_hint`` the engine indexes an Iceberg-style
table of multi-turn conversation / agent transcripts with columns

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp)

Each turn is one indexable document (reference ``Document``,
/root/reference/src/document.rs:3-8: ``{id, content}`` — ``content`` maps
to ``text``; the other columns ride along as metadata and are never
tokenized). Two things live here:

1. deterministic synthetic transcript generation at any scale — seeded,
   distributed via ``spark.range`` (no driver-side data), so tests and
   benches need no external data;
2. stable dense doc-id assignment over ``(conv_id, turn_idx)`` ordering —
   the per-row invariant ("per-turn text equality under stable turn
   ordering") and rank tie-breaking both hang off this.

doc-id assignment is a scalable zipWithIndex: range-repartition by the
order key, count rows per partition (one tiny row per partition to the
driver), broadcast the prefix-sum offsets back, add partition-local
row_number. No global single-partition window, so it holds at 10^12 rows.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "search", "bash", "python", "browser"]

# Deterministic word pool for synthetic turn text (seeded selection by
# hash, not RNG, so any row's text is a pure function of (seed, ids)).
_WORDS = [
    "scan", "merge", "join", "filter", "shuffle", "partition", "broadcast",
    "index", "token", "query", "phrase", "prefix", "score", "rank",
    "stream", "batch", "window", "agent", "tool", "call", "plan", "step",
    "error", "retry", "commit", "read", "write", "cache", "spill", "sort",
    "the", "a", "to", "of", "and", "run", "now", "done", "ok", "result",
]


def synthetic_transcripts(
    spark: SparkSession,
    n_conversations: int = 200,
    turns_per_conv: int = 8,
    seed: int = 42,
    words_per_turn: int = 12,
) -> DataFrame:
    """Deterministic transcript table of ``input_hint`` shape.

    Fully distributed: ``spark.range`` over turn ordinals; every column
    is a hash-derived pure function of (seed, conv, turn) — rerunning at
    any parallelism yields byte-identical rows.
    """
    n = n_conversations * turns_per_conv
    base = spark.range(n).select(
        (F.col("id") / turns_per_conv).cast("long").alias("conv"),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
    )
    h = F.xxhash64(F.lit(seed), F.col("conv"), F.col("turn_idx"))
    words = F.array(*[F.lit(w) for w in _WORDS])
    word_at = lambda i: F.element_at(  # noqa: E731
        words,
        (F.pmod(F.xxhash64(F.lit(seed), F.col("conv"), F.col("turn_idx"), F.lit(i)),
                F.lit(len(_WORDS))) + 1).cast("int"),
    )
    text = F.concat_ws(" ", *[word_at(i) for i in range(words_per_turn)])
    roles = F.array(*[F.lit(r) for r in _ROLES])
    tools = F.array(*[F.lit(t) for t in _TOOLS])
    return base.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("conv").cast("string"), 8, "0")
                 ).alias("conv_id"),
        F.col("turn_idx"),
        F.element_at(roles, (F.pmod(h, F.lit(len(_ROLES))) + 1).cast("int")
                     ).alias("role"),
        text.alias("text"),
        F.element_at(tools, (F.pmod(h, F.lit(len(_TOOLS))) + 1).cast("int")
                     ).alias("tool"),
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("conv") * 3600 + F.col("turn_idx") * 30)
        ).alias("ts"),
    )


def transcripts_from_documents(docs: DataFrame, turns_per_conv: int = 8) -> DataFrame:
    """Reshape the driver's ``documents`` table into transcript shape.

    Deterministic: turn text is the document text; conversation/turn
    structure is derived from ``doc_id``. Used by bench.py so the
    benchmark corpus is exactly the sandbox parquet at the chosen sf.
    """
    return docs.select(
        F.concat(
            F.lit("conv-"),
            F.lpad((F.col("doc_id") / turns_per_conv).cast("long").cast("string"),
                   8, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]),
            (F.pmod(F.col("doc_id"), F.lit(len(_ROLES))) + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id") * 30)
        ).alias("ts"),
    )


def assign_doc_ids(
    df: DataFrame,
    order_cols: Optional[List[str]] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Stable dense ``doc_id`` (0..N-1) in ``(conv_id, turn_idx)`` order.

    Scalable zipWithIndex (never ``monotonically_increasing_id``, which
    is partition-layout-dependent, and never a global one-partition
    window):

      1. range-repartition + sort by the order key;
      2. count rows per physical partition (partition count rows to the
         driver — tiny);
      3. broadcast prefix-sum offsets; doc_id = offset + local row_number.
    """
    order_cols = order_cols or ["conv_id", "turn_idx"]
    if num_partitions is None:
        df = df.repartitionByRange(*order_cols)
    else:
        df = df.repartitionByRange(num_partitions, *order_cols)
    # Materialize ONE evaluation of the range partitioning before
    # observing partition sizes: the partitioner's sampled boundaries
    # can differ between evaluations, and the broadcast offsets below
    # are only valid for the evaluation they were measured on.
    # localCheckpoint (not persist): it breaks lineage so every derived
    # write sees the same ids, and its blocks are released by the
    # ContextCleaner when the DataFrame is garbage-collected — repeated
    # calls in one session don't accumulate pinned cache (a .persist()
    # here would live in the CacheManager until explicit unpersist).
    # On a multi-executor cluster prefer writing the assigned table to
    # storage and re-reading it (executor loss drops local checkpoints).
    part = df.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    sizes = {
        r["_pid"]: r["cnt"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn(
            "doc_id", (offset_expr + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_pid")
    )


def transcript_docs(transcripts: DataFrame) -> DataFrame:
    """Transcript table -> document table (doc_id, text, + metadata)."""
    return assign_doc_ids(transcripts).select("doc_id", *TRANSCRIPT_COLS)


def conversation_topk(
    engine,
    conv_map: DataFrame,
    text: str,
    k: int = 10,
    agg: str = "max",
    filter_docs: Optional[DataFrame] = None,
    role_boosts: Optional[dict] = None,
) -> DataFrame:
    """Top-k CONVERSATIONS for a BM25 query over turn-level docs.

    Transcript search users ask "which conversations are about X", not
    "which turns": score every matching turn (``engine.bm25(text,
    k=None)`` — no per-turn limit, a turn outside the turn-level top-k
    can still carry its conversation), join the (doc_id, conv_id) map,
    aggregate per conversation — ``agg="max"`` ranks by the best turn
    (robust to conversation length), ``"sum"`` by total evidence — and
    take the top-k by (score desc, conv_id asc).

    Returns (conv_id, score, n_turns) with n_turns = matching turns.
    The conv_map join runs on doc_id (shuffle hash under AQE — the map
    is corpus-sized, the matched side is query-sized; Spark picks);
    the aggregation is one combinable groupBy. ``filter_docs`` composes
    (e.g. restrict to role='user' turns before ranking).

    ``role_boosts`` (e.g. ``{"assistant": 2.0, "user": 1.5}``) weights
    each turn's BM25 score by its speaker role before the conversation
    aggregate — a BM25F-style per-field boost for the transcript
    payload, where a turn IS a single-role field. ``conv_map`` must
    then also carry a ``role`` column. Unmapped roles weight 1.0;
    idf/avgdl/N stay corpus-global (the boost scales scores, never the
    statistics), and the multiply is a literal-map lookup in the same
    JVM projection — no extra join or shuffle.
    """
    if agg not in ("max", "sum"):
        raise ValueError(f"agg must be max|sum, got {agg!r}")
    per_doc = engine.bm25(text, k=None, filter_docs=filter_docs)
    aggf = (F.max if agg == "max" else F.sum)("score")
    if role_boosts:
        if "role" not in conv_map.columns:
            raise ValueError("role_boosts needs a 'role' column in conv_map")
        boost_map = F.create_map(
            *[F.lit(x) for kv in sorted(role_boosts.items()) for x in kv]
        )
        per_doc = (
            per_doc.join(
                conv_map.select("doc_id", "conv_id", "role"), "doc_id"
            )
            .withColumn(
                "score",
                F.col("score")
                * F.coalesce(
                    boost_map[F.col("role")].cast("double"), F.lit(1.0)
                ),
            )
            .select("doc_id", "conv_id", "score")
        )
    else:
        per_doc = per_doc.join(conv_map.select("doc_id", "conv_id"), "doc_id")
    return (
        per_doc
        .groupBy("conv_id")
        .agg(aggf.alias("score"), F.count(F.lit(1)).alias("n_turns"))
        .orderBy(F.desc("score"), F.asc("conv_id"))
        .limit(k)
    )


def recency_boosted_topk(
    engine,
    meta: DataFrame,
    text: str,
    now,
    half_life_hours: float = 168.0,
    k: int = 10,
    ts_col: str = "ts",
    filter_docs: Optional[DataFrame] = None,
) -> DataFrame:
    """BM25 top-k with exponential time decay — the function_score
    recency pattern for transcript search ("about X, preferring recent
    turns"). Engine extension; the reference has no timestamps.

    ``final = bm25 * 0.5 ^ (age_hours / half_life_hours)`` with
    ``age_hours = (now - ts) / 3600`` (negative ages — future turns —
    boost above 1, deliberately: no clamping). BM25 statistics stay
    corpus-global; only the final score is scaled.

    ``meta`` carries (doc_id, ``ts_col`` timestamp). Plan shape: score
    every matching turn (k=None — a turn outside the un-decayed top-k
    can still win after decay, so no early cut is sound), one hash
    join to meta on doc_id (matched side is query-sized), JVM-side
    decay multiply, TakeOrdered top-k. Returns
    (doc_id, score, decayed) ordered by (decayed desc, doc_id asc).
    """
    if half_life_hours <= 0:
        raise ValueError(
            f"half_life_hours must be positive, got {half_life_hours}"
        )
    scored = engine.bm25(text, k=None, filter_docs=filter_docs)
    age_h = (
        F.lit(now).cast("timestamp").cast("double")
        - F.col(ts_col).cast("double")
    ) / F.lit(3600.0)
    return (
        scored.join(meta.select("doc_id", ts_col), "doc_id")
        .withColumn(
            "decayed",
            F.col("score")
            * F.pow(F.lit(0.5), age_h / F.lit(float(half_life_hours))),
        )
        .select("doc_id", "score", "decayed")
        .orderBy(F.desc("decayed"), F.asc("doc_id"))
        .limit(k)
    )


def conversation_context(
    turn_docs: DataFrame,
    results: DataFrame,
    window: int = 1,
) -> DataFrame:
    """Surrounding turns for each search hit — the retrieval primitive
    over transcripts (a matched turn is rarely useful without the turns
    around it).

    ``turn_docs``: the turn-level document table with its conversation
    structure (doc_id, conv_id, turn_idx, + any payload columns, e.g.
    ``transcript_docs`` output). ``results``: any frame with a doc_id
    column (e.g. ``FtsEngine.bm25(...)`` / ``results(...)``).

    Returns every turn of a hit's conversation within ``window`` of the
    hit's turn_idx — all ``turn_docs`` columns plus (hit_doc_id,
    hit_turn_idx, offset). A turn inside two hits' windows appears once
    per hit (context is per-hit by design; dropDuplicates on doc_id if
    a flat set is wanted).

    Scale shape: the hit list is query-sized (top-k), so it broadcasts;
    the equi-join key is conv_id (hash lookup into the corpus-sized
    turn table) with the turn range as a residual filter — never a
    corpus shuffle.
    """
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    hits = (
        results.select("doc_id")
        .join(turn_docs.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .select(
            F.col("conv_id").alias("_h_conv"),
            F.col("turn_idx").alias("hit_turn_idx"),
            F.col("doc_id").alias("hit_doc_id"),
        )
    )
    joined = turn_docs.join(
        F.broadcast(hits),
        (F.col("conv_id") == F.col("_h_conv"))
        & (F.col("turn_idx") >= F.col("hit_turn_idx") - window)
        & (F.col("turn_idx") <= F.col("hit_turn_idx") + window),
    )
    return joined.select(
        *turn_docs.columns,
        "hit_doc_id",
        "hit_turn_idx",
        (F.col("turn_idx") - F.col("hit_turn_idx")).alias("offset"),
    )


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """Read a transcript table from any supported source format.

    parquet/iceberg-dir reads rely on the embedded schema; csv/json get
    the input_hint schema applied explicitly (csv additionally parses
    the header and timestamps). Column order/extra columns are
    normalized to TRANSCRIPT_COLS.
    """
    if format == "parquet":
        df = spark.read.parquet(path)
    elif format == "json":
        df = spark.read.schema(TRANSCRIPT_DDL).json(path)
    elif format == "csv":
        # CSV cannot distinguish empty string from null; normalize the
        # optional string columns back to '' (the transcript convention)
        df = (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .csv(path)
            .fillna({"role": "", "text": "", "tool": ""})
        )
    else:
        df = spark.read.format(format).load(path)
    missing = [c for c in TRANSCRIPT_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"transcript source missing columns: {missing}")
    return df.select(*TRANSCRIPT_COLS)


def conversation_having(
    engine,
    conv_map: DataFrame,
    must,
    must_not=None,
) -> DataFrame:
    """Conversation-level boolean retrieval (the parent-child / ES
    ``has_child`` shape for the transcript payload): return the
    conversations where EVERY ``must`` clause matches at least one turn
    and NO ``must_not`` clause matches any turn.

    Each clause is a ``Query`` AST, a query STRING (parsed with the
    query language), or a ``(query, role)`` pair that restricts the
    clause to turns spoken by that role — e.g. "conversations where the
    USER asked about billing and the ASSISTANT mentioned a refund, and
    no tool call errored". This is strictly more expressive than
    ``And`` over turn-level docs: the clauses may be satisfied by
    DIFFERENT turns of the same conversation.

    ``conv_map`` needs (doc_id, conv_id) and, when any clause is
    role-scoped, a ``role`` column. Returns (conv_id) ordered asc.

    Scale shape: each clause's membership frame is bounded by its
    terms' document frequencies (term-pruned postings scan, never
    corpus-wide); the conv_map join runs on doc_id, the per-clause
    conversation sets are distinct'd (query-sized), and the boolean
    combine is a chain of semi/anti joins on conv_id — small keyed
    sets, broadcastable under AQE. Nothing here scans the corpus.
    """
    from .qparse import parse_query

    def _norm(clauses):
        out = []
        for c in clauses or []:
            q, role = c if isinstance(c, tuple) else (c, None)
            out.append((parse_query(q) if isinstance(q, str) else q, role))
        return out

    must = _norm(must if isinstance(must, list) else [must])
    must_not = _norm(must_not)
    if not must:
        raise ValueError("conversation_having needs at least one must clause")

    def _conv_set(q, role) -> DataFrame:
        docs = engine.compile(q).docs.select("doc_id")
        if role is not None:
            if "role" not in conv_map.columns:
                raise ValueError(
                    "role-scoped clause needs a 'role' column in conv_map"
                )
            side = conv_map.filter(F.col("role") == role)
        else:
            side = conv_map
        return (
            docs.join(side.select("doc_id", "conv_id"), "doc_id")
            .select("conv_id")
            .distinct()
        )

    out = _conv_set(*must[0])
    for q, role in must[1:]:
        out = out.join(_conv_set(q, role), "conv_id", "left_semi")
    for q, role in must_not:
        out = out.join(_conv_set(q, role), "conv_id", "left_anti")
    return out.orderBy("conv_id")


def tool_transitions(turns: DataFrame) -> DataFrame:
    """Tool-call Markov transitions over the transcript payload: for
    every pair of CONSECUTIVE turns of one conversation (ordered by
    ``turn_idx``) where both turns carry a tool call, count the
    (src_tool, dst_tool) bigram corpus-wide -> (src_tool, dst_tool, n),
    ordered by (src_tool, dst_tool).

    The agent-analytics staple ("after `search`, what runs next?";
    "how often does `bash` chain into itself?") — turns whose ``tool``
    is null/empty are NOT tool calls and break the chain (a
    search -> assistant-text -> bash sequence contributes no pair).

    Scale shape: one window ``lag`` partitioned by ``conv_id`` ordered
    by ``turn_idx`` — conversations are bounded (thousands of turns,
    never corpus-sized), so the per-key sort is tiny and the single
    hash-partition exchange on conv_id spreads evenly; the bigram count
    is a partial-agg groupBy over at most |tools|^2 distinct keys.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    is_tool = F.col("tool").isNotNull() & (F.col("tool") != "")
    pairs = (
        turns.select("conv_id", "turn_idx", "tool")
        .withColumn("src_tool", F.lag("tool").over(w))
        .withColumn("src_is_tool", F.lag(is_tool).over(w))
        .withColumn(
            "consecutive",
            F.lag("turn_idx").over(w) == F.col("turn_idx") - 1,
        )
        .filter(
            is_tool
            & F.col("src_is_tool")
            & F.col("consecutive")
        )
    )
    return (
        pairs.groupBy("src_tool", F.col("tool").alias("dst_tool"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("src_tool", "dst_tool")
    )


def tool_usage(turns: DataFrame) -> DataFrame:
    """Per-conversation tool-usage profile -> (conv_id, n_turns,
    n_tool_calls, n_distinct_tools, first_tool, last_tool), ordered by
    conv_id.

    ``first_tool`` / ``last_tool`` are the tools of the first/last
    tool-carrying turn in ``turn_idx`` order (null when the
    conversation never calls a tool) — the "how did this agent session
    start and end" features a transcript-quality pipeline filters on.

    Scale shape: two partial-agg groupBys over conv_id (all turns; tool
    turns only) joined on conv_id — the tool-side first/last extraction
    is ``min_by``/``max_by`` over PRE-FILTERED rows (no window, no
    per-group sort, and no engine-specific null-ordering semantics),
    and both exchanges hash on the same key so AQE coalesces them.
    """
    is_tool = F.col("tool").isNotNull() & (F.col("tool") != "")
    base = (
        turns.select("conv_id")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_turns"))
    )
    tools = (
        turns.select("conv_id", "turn_idx", "tool")
        .filter(is_tool)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tool_calls"),
            F.count_distinct("tool").cast("bigint").alias("n_distinct_tools"),
            F.min_by("tool", "turn_idx").alias("first_tool"),
            F.max_by("tool", "turn_idx").alias("last_tool"),
        )
    )
    return (
        base.join(tools, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.coalesce("n_tool_calls", F.lit(0)).cast("bigint")
            .alias("n_tool_calls"),
            F.coalesce("n_distinct_tools", F.lit(0)).cast("bigint")
            .alias("n_distinct_tools"),
            "first_tool",
            "last_tool",
        )
        .orderBy("conv_id")
    )
