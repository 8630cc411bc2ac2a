"""Physical-plan assertions: the optimizations the engine relies on at
scale must actually appear in the plan (SURVEY §4), or a refactor could
silently regress them.

* term predicates reach the parquet scan (row-group pruning over the
  term-sorted postings files);
* the per-query-term df table and doc membership joins broadcast (never
  a sort-merge shuffle of the big postings side against a 3-row dict);
* column pruning: the BM25 path never reads the positions column.
"""

import pytest

from inverted_index_spark.build import build_and_save
from inverted_index_spark.qast import Match, Prefix
from inverted_index_spark.query import FtsEngine


def _formatted(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("planidx"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    return FtsEngine(build_and_save(spark, docs, path, ngrams=False))


def test_bm25_pushes_term_filter_and_broadcasts(engine):
    plan = _formatted(engine.bm25("scan merge join", k=10))
    assert "In(term, [join,merge,scan])" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_prunes_positions_column(engine):
    plan = _formatted(engine.bm25("scan merge join", k=10))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    postings_scans = [l for l in scan_lines if "tf" in l]
    assert postings_scans, "no postings scan found"
    assert all("positions" not in l for l in postings_scans)


def test_prefix_range_scan_is_pushed(engine):
    plan = _formatted(
        engine.results(Prefix("mer"), k=10, with_positions=False)
    )
    assert "GreaterThanOrEqual(term,mer)" in plan
    assert "LessThan(term,mes)" in plan


def test_match_production_mode_pushes_range(engine):
    plan = _formatted(
        engine.results(Match("merge"), k=10, with_positions=False)
    )
    # full-token index: Match compiles to prefix-expansion range scan
    assert "GreaterThanOrEqual(term,merge)" in plan


def test_bm25_topk_is_take_ordered(engine):
    plan = _formatted(engine.bm25("scan", k=10))
    assert "TakeOrderedAndProject" in plan


def test_build_doc_layout_has_single_exchange(spark):
    """The doc layout's whole build plan moves data once: the input
    repartition before the assembly kernel. No exchange may follow
    mapInArrow (the 30M-row postings shuffle this layout eliminates)."""
    from pyspark.sql import functions as F

    from inverted_index_spark.arrow_build import assemble_postings_arrow
    from inverted_index_spark.udfs import POSTINGS_ROW_SCHEMA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    assembled = (
        docs.repartition(8, F.col("doc_id"))
        .mapInArrow(assemble_postings_arrow, schema=POSTINGS_ROW_SCHEMA)
        .sortWithinPartitions("term", "doc_id")
    )
    plan = _formatted(assembled)
    # exactly one Exchange node => nothing after the kernel, and the
    # sort is partition-local (formatted mode prints each node once in
    # the tree and once in the detail section: ") Exchange")
    assert plan.count(") Exchange") == 1
    assert "MapInArrow" in plan


def test_topk_positions_are_two_pass(engine):
    """results(q, k, with_positions=True) must NOT collect position
    arrays corpus-wide pre-limit: pass 1 scores widths only and takes
    top-k (TakeOrderedAndProject with no collect_list upstream of it);
    positions are aggregated only for the k winners (downstream of a
    broadcast semi-join on their doc ids)."""
    df = engine.results(Match("merge"), k=5, with_positions=True)
    plan = _formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "collect_list" in plan  # winners' positions pass exists
    # the take-ordered pass carries no positions aggregation: the limit
    # input references width/score only
    take = plan[plan.index("TakeOrderedAndProject"):]
    first_section = take.split("\n\n")[0]
    assert "collect_list" not in first_section


def test_topk_positions_match_full_results(spark, engine):
    """Two-pass top-k returns exactly the head of the single-pass
    result, positions included."""
    from inverted_index_spark.qast import And, Phrase

    for q in [Match("merge"), And(Match("scan"), Match("merge")),
              Phrase("batch batch")]:
        full = engine.results(q, with_positions=True).collect()
        topk = engine.results(q, k=4, with_positions=True).collect()
        key = lambda r: (  # noqa: E731
            r["doc_id"],
            round(float(r["score"]), 6),
            [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
        )
        assert [key(r) for r in topk] == [key(r) for r in full[:4]]


def test_filtered_bm25_plan_keeps_pushdown(spark, engine):
    """The metadata filter must not break term pushdown, column pruning
    or the top-k: the semi-join restricts candidates on doc_id while
    In(term) still reaches the scan."""
    allowed = spark.range(100).withColumnRenamed("id", "doc_id")
    df = engine.bm25("scan merge join", k=10, filter_docs=allowed)
    plan = _formatted(df)
    assert "In(term, [join,merge,scan])" in plan
    assert "LeftSemi" in plan
    assert "positions" not in plan
    assert "TakeOrderedAndProject" in plan


def test_andnot_plan_is_anti_join_with_pushdown(engine):
    from inverted_index_spark.qast import And, AndNot

    df = engine.results(
        AndNot(Match("merge"), Match("scan")), with_positions=False
    )
    plan = _formatted(df)
    assert "LeftAnti" in plan
    # both term ranges still pushed to the scans (full-token layout:
    # prefix-expansion range predicates)
    assert "GreaterThanOrEqual(term,merge)" in plan
    assert "GreaterThanOrEqual(term,scan)" in plan


def test_wildcard_plan_pushes_prefix_range(engine):
    """Wildcard's literal prefix must reach the parquet scan as a
    sargable range; only the residual pattern runs as a filter."""
    from inverted_index_spark.qast import Wildcard

    plan = _formatted(
        engine.results(Wildcard("me?ge"), k=10, with_positions=False)
    )
    assert "GreaterThanOrEqual(term,me)" in plan
    assert "LessThan(term,mf)" in plan


def test_fuzzy_plan_broadcasts_expansion(engine):
    """Fuzzy's expanded term set joins the postings by broadcast
    semi-join — never a sort-merge shuffle of the postings side."""
    from inverted_index_spark.qast import Fuzzy

    plan = _formatted(
        engine.results(Fuzzy("merge", 1), k=10, with_positions=False)
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_near_plan_prunes_inputs_and_pushes_ranges(engine):
    """Near's band join inputs are semi-join pruned and both term
    ranges reach the scans; the pos window is a join residual, not a
    cartesian product."""
    from inverted_index_spark.qast import Near

    plan = _formatted(
        engine.results(Near("scan merge", 3), k=10, with_positions=False)
    )
    assert "GreaterThanOrEqual(term,scan)" in plan
    assert "GreaterThanOrEqual(term,merge)" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_atleast_plan_pushes_ranges_no_smj(engine):
    """AtLeast membership is ONE branch-tagged aggregation with the
    HAVING threshold; every child term range reaches its scan and the
    row fetch semi-joins by broadcast — no sort-merge shuffle."""
    from inverted_index_spark.qast import AtLeast, Match

    plan = _formatted(
        engine.results(
            AtLeast(2, Match("scan"), Match("merge"), Match("join")),
            with_positions=False,
        )
    )
    assert "GreaterThanOrEqual(term,scan)" in plan
    assert "GreaterThanOrEqual(term,merge)" in plan
    assert "GreaterThanOrEqual(term,join)" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_suggest_plan_scans_dictionary_only(engine):
    """suggest touches the TERM DICTIONARY, never the postings table,
    and the query-term side is a broadcast build of a length-band
    nested-loop join (the only join shape for a non-equi condition —
    fine, the build side is the handful of query terms)."""
    plan = _formatted(engine.suggest("mereg scann", max_edits=2, k=3))
    assert "postings" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_significant_terms_plan_semi_join_with_pushdown(engine):
    """The foreground df pass is a semi-join over the postings scan
    with the query's term range pushed to the membership branch; bg df
    joins the termdict (no cartesian anywhere)."""
    from inverted_index_spark.qast import Match

    plan = _formatted(engine.significant_terms(Match("merge"), k=10))
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(term,merge)" in plan
    assert "CartesianProduct" not in plan


def test_explain_bm25_plan_is_top_k_then_broadcast(engine):
    """explain_bm25: the top-k doc set comes from TakeOrderedAndProject
    and joins back to the per-term frame by broadcast."""
    plan = _formatted(engine.explain_bm25("scan merge join", k=5))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_min_window_plan_prunes_before_python(engine):
    """min_window: the two-pointer kernel is ONE scalar Arrow-batched
    pandas UDF over collect_list arrays (no per-group Python task),
    and its input is already And-pruned (broadcast semi-join on the
    candidate docs) — non-candidate positions never reach Python."""
    plan = _formatted(engine.min_window("scan merge join"))
    assert "ArrowEvalPython" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def _lambda_spans(plan: str):
    """Extract the text of every lambdafunction(...) scope (balanced
    parens) from an optimized-plan string."""
    spans = []
    i = 0
    needle = "lambdafunction("
    while True:
        j = plan.find(needle, i)
        if j < 0:
            break
        depth, k = 1, j + len(needle)
        while k < len(plan) and depth:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        spans.append(plan[j:k])
        i = k
    return spans


def _assert_no_split_in_lambdas(df, op_name):
    """The no-CSE-inside-HOF-lambdas house rule (ARCHITECTURE.md):
    Catalyst re-evaluates a `split(text)` referenced inside a
    transform/filter lambda on EVERY element access — O(tokens^2) per
    row (cooccurrence was 10x slower before the fix). The token array
    must be projected once and the lambda must reference the column.
    A split of a lambda-bound variable (per-element work on already-
    small input) is fine; a split of an outer attribute is the bug."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for span in _lambda_spans(plan):
        import re

        bad = [
            m.group(0)
            for m in re.finditer(r"split\((?!lambda)[^,)]*", span)
        ]
        assert not bad, (
            f"{op_name}: split() of a non-lambda input inside a HOF "
            f"lambda (O(tokens^2)/row re-evaluation): {bad}"
        )


def test_hof_lambdas_never_resplit_text(spark):
    """Plan canary across the shingle family: reintroducing an inline
    split(text) into any higher-order-function lambda fails here."""
    import pyspark.sql.functions as F

    from inverted_index_spark.pipelines.dedup import (
        dup_spans,
        line_dedup,
        ngram_jaccard_pairs,
        shingles,
        span_dedup,
        span_dedup_max,
    )
    from inverted_index_spark.pipelines.textstats import (
        cooccurrence,
        fingerprint,
        repetition,
        rolling_fingerprint,
        token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        ["doc_id", "text"],
    )
    ops = {
        "shingles": shingles(docs, k=3),
        "ngram_jaccard_pairs": ngram_jaccard_pairs(docs, k=3),
        "span_dedup": span_dedup(docs, window=3),
        "span_dedup_max": span_dedup_max(docs, window=3),
        "dup_spans": dup_spans(docs, window=3),
        "line_dedup": line_dedup(docs, min_docs=2),
        "cooccurrence": cooccurrence(docs, window=2),
        "repetition": repetition(docs, k=3),
        "rolling_fingerprint": rolling_fingerprint(docs, window=4),
        "fingerprint": fingerprint(docs),
        "token_counts": token_counts(docs),
    }
    for name, df in ops.items():
        _assert_no_split_in_lambdas(df, name)


def test_round5_op_plans_broadcast_no_smj(spark):
    """Round-5 ops keep their scale shapes: Bloom's set-bit table and
    the quantile q-list ride broadcast (never a SortMergeJoin of the
    corpus side), everything stays JVM-side (no Python eval nodes),
    and the approx-quantile aggregation is hash-based."""
    import pyspark.sql.functions as F

    from inverted_index_spark.pipelines.corpus import bloom_contamination
    from inverted_index_spark.pipelines.dedup import dup_spans
    from inverted_index_spark.pipelines.sketches import (
        group_quantiles_approx,
    )
    from inverted_index_spark.pipelines.textstats import domain_stats

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")

    p = _formatted(bloom_contamination(docs, docs.filter("doc_id < 6")))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p

    vals = docs.select(
        (F.col("doc_id") % 8).alias("g"),
        F.size(F.split("text", " ")).cast("bigint").alias("v"),
    )
    p = _formatted(group_quantiles_approx(vals, "g", "v"))
    # the q-list join is keyless -> broadcast nested loop over 3 rows
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    assert "HashAggregate" in p
    assert "EvalPython" not in p

    # dup_spans lazily checkpoints its span table before the final
    # sort (so range-partition sampling never re-runs the pipeline),
    # which hides the upstream plan behind a Scan ExistingRDD — pin
    # the island scan on the pre-checkpoint helper instead
    from inverted_index_spark.pipelines.dedup import (
        _coalesce_islands,
        _span_dup_occ,
    )

    _, dup_occ = _span_dup_occ(docs, 4, checkpoint=False)
    p = _formatted(_coalesce_islands(dup_occ, 4))
    assert "Window" in p
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p
    p = _formatted(dup_spans(docs, window=4))
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p

    p = _formatted(domain_stats(docs))
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p
