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


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "fts",
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mix primitive
    ("keep 100% of lang=en docs, 30% of lang=de, drop the rest").

    A doc survives iff ``u(seed, doc_id) < rate(stratum)`` where u is
    the same md5-derived uniform as :func:`corpus_split` — a pure
    function of (seed, doc_id), so the sample is reproducible
    bit-for-bit on any engine, cluster size or partition layout, and
    composable: the 30% sample at seed s is a SUBSET of the 50% sample
    at seed s (nested samples for mix ablations). Strata absent from
    ``rates`` get ``default_rate``.

    Scale: one narrow JVM projection + filter; no shuffle, no RNG
    state, no per-stratum passes — one scan regardless of |rates|.
    """
    for k, v in rates.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "|"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(16 ** 8))
    )
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return docs.filter(u < rate)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    length_col: str = "n_tokens",
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Chunked sequence packing for LLM pretraining batches: assign
    each doc a ``seq_id`` by its running token prefix-sum in
    ``order_col`` order — ``seq_id = cumsum_before // budget``,
    ``seq_off = cumsum_before % budget`` — so consecutive docs fill
    fixed-token-budget training sequences (the t5/gpt-neox packed-
    pretraining shape; a doc may straddle two sequences, which packers
    handle by splitting at the boundary offset this column gives).

    Returns ``docs`` + (seq_id: bigint, seq_off: bigint).

    The prefix-sum is distributed exactly like
    :func:`~inverted_index_spark.transcripts.assign_doc_ids`'s
    scalable zipWithIndex — never a global one-partition window:

      1. range-repartition + per-partition sort by ``order_col``
         (one materialized evaluation, see assign_doc_ids);
      2. per-partition token totals to the driver (|partitions| rows);
      3. broadcast prefix offsets; cumsum = offset + local running sum.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    if num_partitions is None:
        out = docs.repartitionByRange(order_col)
    else:
        out = docs.repartitionByRange(num_partitions, order_col)
    part = out.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    totals = {
        r["_pid"]: r["t"]
        for r in part.groupBy("_pid")
        .agg(F.sum(length_col).cast("bigint").alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid] or 0)
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(
        F.sum(length_col).over(w), F.lit(0)
    ).cast("bigint")
    cum_before = (offset_expr + local_before).cast("bigint")
    return part.select(
        *docs.columns,
        (F.floor(cum_before / budget)).cast("bigint").alias("seq_id"),
        (cum_before % budget).cast("bigint").alias("seq_off"),
    )


def temperature_mix(
    docs: DataFrame, group_col: str, alpha: float = 0.7
) -> DataFrame:
    """Temperature-scaled sampling mix (the multilingual/domain recipe:
    p_i proportional to (n_i / N) ** alpha) -> one row per group:
    (``group_col``, n_docs, weight, rate).

    ``weight`` is the normalized sampling probability; ``rate`` is the
    per-document inclusion rate that realizes it in expectation
    (weight * N / n_i, capped at 1.0) — feed it straight into
    :func:`stratified_sample`'s rates dict to materialize the mix
    deterministically. ``alpha=1`` reproduces natural proportions,
    ``alpha=0`` uniform-over-groups; 0.2-0.7 are the published
    upsampling temperatures for low-resource groups.

    Scale: one partial-agg groupBy (group cardinality rows) and a
    broadcast 1-row total — corpus scanned once, output is tiny.
    Deterministic double math end to end, so any engine reproduces the
    weights bit-for-bit.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    powed = counts.select(
        group_col,
        "n_docs",
        F.pow(F.col("n_docs").cast("double"), float(alpha)).alias("_p"),
    )
    tot = powed.agg(
        F.sum("_p").alias("_z"), F.sum("n_docs").cast("double").alias("_n")
    )
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            (F.col("_p") / F.col("_z")).alias("weight"),
            F.least(
                F.lit(1.0),
                (F.col("_p") / F.col("_z"))
                * F.col("_n")
                / F.col("n_docs").cast("double"),
            ).alias("rate"),
        )
    )


def bloom_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter decontamination probe -> one row per training doc:
    (doc_id, n_grams: bigint distinct n-gram shingles, n_flagged:
    bigint shingles whose ``k_hashes`` Bloom bits are ALL set,
    contaminated: boolean). Zero-overlap docs are present with
    n_flagged = 0 (unlike :func:`ngram_contamination`, which only
    emits hits — this op's output is the per-doc decision table).

    The 100-TB path for :func:`ngram_contamination`: the exact check
    broadcasts the eval side's DISTINCT SHINGLES — fine for one
    benchmark, impossible when the blocklist is billions of n-grams
    (every eval suite + licensed-text corpus ever collected). Here the
    broadcast side is the Bloom SET-BIT table, at most ``m_bits`` rows
    no matter how large the eval corpus grows, and building it is one
    distinct over (shingle x k positions) — partial-agg combinable and
    mergeable across eval shards by construction (a Bloom union is a
    bit OR == a distinct union of set positions).

    One-sided error, cross-engine exact: a flagged doc may be a false
    positive (rate ~ (1 - e^(-k n_ev / m))^k; size ``m_bits`` to the
    blocklist), but flags are a PURE FUNCTION of the inputs — bit j of
    a shingle is md5-derived (same ``'0x'||hex`` idiom as
    ``kmv_distinct``), so Spark and the DuckDB oracle flag the exact
    same docs, false positives included. Deduplicate-then-drop
    pipelines anti-join ``contaminated`` exactly as
    :func:`decontaminate` does; route the survivors of a Bloom
    pre-filter into the exact check when a zero-FP guarantee matters
    (classic two-stage filter, Bloom kills ~all of the corpus first).
    """
    if m_bits < 2:
        raise ValueError(f"m_bits must be >= 2, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")

    def bit(col, j):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )

    ev = shingles(eval_docs, k=n).select("shingle").distinct()
    bits = (
        ev.select(
            F.explode(
                F.array(*[bit(F.col("shingle"), j) for j in range(k_hashes)])
            ).alias("pos")
        )
        .distinct()
    )
    all_docs = docs.select("doc_id").distinct()
    tr = shingles(docs, k=n).select("doc_id", "shingle").distinct()
    probe = tr.select(
        "doc_id",
        "shingle",
        F.posexplode(
            F.array(*[bit(F.col("shingle"), j) for j in range(k_hashes)])
        ).alias("j", "pos"),
    )
    flagged = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == k_hashes)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_flagged"))
    )
    totals = tr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    # anchor on ALL input docs: a doc shorter than n tokens has no
    # shingles at all, but still gets its decision row (n_grams = 0,
    # never contaminated) — "one row per training doc" holds literally
    return (
        all_docs.join(totals, "doc_id", "left")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_grams"),
            F.coalesce(F.col("n_flagged"), F.lit(0))
            .cast("bigint")
            .alias("n_flagged"),
            (F.coalesce(F.col("n_flagged"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def group_sample_n(
    docs: DataFrame,
    group_col: str,
    n: int,
    seed: str = "fts",
    oversample: float = 4.0,
) -> DataFrame:
    """Deterministic exactly-``n``-per-group sample -> (``group_col``,
    doc_id, rank: int 1..n), ordered (group, rank) — the balanced
    eval-set / per-domain-cap primitive ("25 docs per language",
    "at most N pages per site") that :func:`stratified_sample`'s
    rate-based form cannot pin to an exact count.

    A doc's sort key is the md5 uniform ``u(seed, doc_id)`` (ties by
    doc_id): a pure function of (seed, doc_id), so the selected set is
    bit-reproducible on any engine or layout, and groups smaller than
    ``n`` return whole.

    Scale — the naive plan (row_number over each full group) makes a
    mega-group ONE sort partition, the classic skew trap. Two phases
    instead: (1) one partial-agg count per group derives a survival
    rate ``min(1, oversample * n / count)``; (2) the corpus is
    prefiltered by ``u < rate`` (narrow, no shuffle, rate joined in by
    broadcast), so the per-group window input is ~``oversample * n``
    rows REGARDLESS of group size, then the exact rank keeps ``n``.
    The prefilter keeps at least ``n`` with probability astronomically
    close to 1 for any group (binomial with mean ``oversample * n``;
    groups <= ``oversample * n`` pass rate 1.0 and are exact by
    construction) — and because the oracle replays both phases, the
    result is deterministic either way.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if oversample < 1.0:
        raise ValueError(f"oversample must be >= 1.0, got {oversample}")
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "|"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(oversample) * n) / F.col("_cnt")
    )
    pre = (
        docs.select(F.col(group_col), F.col("doc_id"), u.alias("_u"))
        .join(F.broadcast(counts), group_col)
        .filter(F.col("_u") < rate)
    )
    w = Window.partitionBy(group_col).orderBy(
        F.asc("_u"), F.asc("doc_id")
    )
    picked = (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(group_col, "doc_id", F.col("rank").cast("int").alias("rank"))
        .localCheckpoint(eager=False)
    )
    # checkpoint before the global sort (same reasoning as dup_spans):
    # range partitioning samples its input, which would re-run the
    # prefilter + window pipeline a second time; the picked table is
    # |groups| x n — small — so the sample reads it for free
    return picked.orderBy(group_col, "rank")
