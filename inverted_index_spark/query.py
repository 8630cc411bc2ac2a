"""Query AST -> DataFrame compiler (the read path).

Every operator of the reference's query algebra is compiled to a
relational plan that Catalyst optimizes and executes JVM-side — the
tokenizer never runs on document data at query time, and no Python UDF
appears anywhere in the query pipeline:

* Match   -> postings scan with ``term IN (...)`` (exact ngram lookup,
             reference index.rs:76-86)
* Prefix  -> postings range scan ``term >= p AND term < succ(p)``
             (index.rs:109-129); parquet min/max stats prune row-groups
             because postings files are sorted by term
* And     -> branch-count aggregation on doc_id (k-way semi-join,
             util/btree_map_ext.rs:9-50)
* Or      -> unionByName + doc_id re-merge (MergeCoalesceMap,
             util/coalesce.rs:78-120)
* Phrase  -> per adjacent term pair, an equi-join on
             (doc_id, l.pos + 1 = r.pos) — the positional intersection
             of postings.rs:66-112 expressed relationally — then an
             And-combine of the pairs
* position coalescing -> gaps-and-islands window aggregation that
  reproduces the reference's *neighbor-only* merge rule
  (util/coalesce.rs:32-73 + postings.rs:7-15) exactly: two positions
  merge iff same token ordinal AND byte ranges overlap/touch AND they
  are adjacent in (begin, end, pos) sort order
* scoring -> sum of coalesced widths / sqrt(doc bytes) in float32
  (search_result.rs:19-28); order score desc, doc_id asc (index.rs:148-156)

Working in exploded rows (doc_id, begin, end, pos) keeps every stage in
whole-stage codegen; position arrays are only materialized for the final
(top-k) result set.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import analyze_query
from .build import FtsIndex
from .qast import (
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
    regex_parse,
    wildcard_literal_prefix,
    wildcard_regex,
)
from .udfs import byte_slice_highlight, byte_slice_snippet

K1 = 1.2
B = 0.75

ROW_COLS = ["doc_id", "begin", "end", "pos"]


def prefix_upper_bound(prefix: str) -> Optional[str]:
    """Exclusive upper bound for the term range scan: prefix[:-1] +
    successor(last char), skipping surrogates (util/successor.rs:9-24)."""
    last = ord(prefix[-1])
    if last == 0xD7FF:
        nxt = 0xE000
    elif last == 0x10FFFF:
        return None
    else:
        nxt = last + 1
    return prefix[:-1] + chr(nxt)


@dataclass
class PlanResult:
    """Compiled query node.

    docs: membership (doc_id) — docs the node matches, which for Phrase
          includes docs with zero adjacency positions (postings.rs:101-112
          keeps every doc in the pair doc-id intersection).
    rows: matched positions, one row per (doc_id, begin, end, pos).
    complete: True when ``docs`` provably equals the distinct doc ids of
          ``rows`` (scans/unions/intersections of such) — scoring can
          then skip the membership join and its duplicated subtree.
          Phrase breaks it: a doc with both terms but no adjacency is a
          member with zero rows.
    raw: PRE-explode postings of the node (doc_id, positions array),
          when the node is scans/unions of scans. Lets combinators
          semi-join on doc_id BEFORE exploding position arrays — an
          And explodes only surviving docs' postings, and its
          membership branch never reads the positions column at all.
          None for nodes whose rows aren't a postings subset (Phrase).
    """

    docs: DataFrame
    rows: DataFrame
    complete: bool = False
    raw: Optional[DataFrame] = None


class FtsEngine:
    """Compiles Query ASTs against an FtsIndex and scores results.

    BM25 calls (``bm25``, ``bm25_batch``) route to the block-max WAND
    scale path automatically when the index directory holds compressed
    segments that are FRESH (segments.segments_fresh: source token
    matches the live postings state, no un-compacted stream deltas) —
    WAND is exact, 10x+ faster on broad queries, and reads only the
    segments. Pass ``use_segments=False`` to pin the relational
    DataFrame plan (equivalence tests do).
    """

    def __init__(self, index: FtsIndex, use_segments: bool = True):
        self.index = index
        self.use_segments = use_segments

    def _segment_path(self, positional: Optional[bool] = None) -> Optional[str]:
        path = getattr(self.index, "path", None)
        if not self.use_segments or not path:
            return None
        from .segments import segments_fresh

        return path if segments_fresh(path, positional=positional) else None

    # ------------------------------------------------------------------
    # leaf scans

    @staticmethod
    def _explode_raw(raw: DataFrame) -> DataFrame:
        return raw.select("doc_id", F.explode("positions").alias("p")).select(
            "doc_id", "p.begin", "p.end", "p.pos"
        )

    def _empty(self) -> PlanResult:
        raw = self.index.postings.filter(F.lit(False)).select(
            "doc_id", "positions"
        )
        rows = self._explode_raw(raw)
        return PlanResult(
            docs=rows.select("doc_id"), rows=rows, complete=True, raw=raw
        )

    def _scan(self, predicate) -> PlanResult:
        raw = self.index.postings.filter(predicate).select(
            "doc_id", "positions"
        )
        return PlanResult(
            # membership from the un-exploded scan: Catalyst prunes the
            # positions column away for this branch entirely
            docs=raw.select("doc_id").distinct(),
            rows=self._explode_raw(raw),
            complete=True,
            raw=raw,
        )

    def _term_pred(self, term: str):
        """Predicate selecting postings of one query term.

        Parity (ngram) index: exact dictionary lookup (index.rs:81) —
        the stored edge-ngrams make Match prefix-matching implicitly.
        Production (full-token) index: prefix-expansion range scan
        ``[term, succ(term))`` — equivalent because the set of indexed
        ngrams of a token equals its set of char-prefixes (SURVEY §2.4;
        deviation only for tokens whose Unicode lowercase changes char
        count, e.g. İ). Both are sargable: parquet min/max on the
        term-sorted postings files prune row groups either way.
        """
        if self.index.ngrams:
            return F.col("term") == term
        hi = prefix_upper_bound(term)
        pred = F.col("term") >= term
        if hi is not None:
            pred = pred & (F.col("term") < hi)
        return pred

    def _match(self, text: str) -> PlanResult:
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        if not terms:
            return self._empty()
        pred = self._term_pred(terms[0])
        for t in terms[1:]:
            pred = pred | self._term_pred(t)
        return self._scan(pred)

    def _prefix(self, prefix: str) -> PlanResult:
        if not prefix:
            return self._empty()
        hi = prefix_upper_bound(prefix)
        pred = F.col("term") >= prefix
        if hi is not None:
            pred = pred & (F.col("term") < hi)
        return self._scan(pred)

    def _wildcard(self, pattern: str) -> PlanResult:
        """Raw dictionary wildcard (qast.Wildcard): the pattern's
        literal prefix prunes as a sargable term range (parquet min/max
        fences, like Prefix), the residual whole-term match runs as an
        anchored JVM ``rlike`` over the surviving rows — the translated
        subset is dialect-stable, so this equals the segment path's
        driver-side Python expansion exactly.
        """
        if not pattern:
            return self._empty()
        pre = wildcard_literal_prefix(pattern)
        if pre == pattern:  # no wildcard chars: exact dictionary term
            return self._scan(F.col("term") == pattern)
        pred = F.col("term").rlike("^" + wildcard_regex(pattern) + "$")
        if pre:
            pred = (F.col("term") >= pre) & pred
            hi = prefix_upper_bound(pre)
            if hi is not None:
                pred = (F.col("term") < hi) & pred
        return self._scan(pred)

    def _regex(self, pattern: str) -> PlanResult:
        """Raw dictionary regex (qast.Regex): the pattern's leading
        literal run prunes as a sargable term range (parquet min/max
        fences, like Prefix/Wildcard), the residual whole-term match
        runs as an anchored JVM ``rlike`` over the surviving rows — the
        pattern is pre-validated to the dialect-stable subset
        (qast.regex_parse), so this equals the segment path's
        driver-side Python expansion and the RE2 oracle exactly. A
        pure-literal pattern degenerates to an exact dictionary lookup.
        """
        if not pattern:
            return self._empty()
        pre, lit = regex_parse(pattern)
        if lit is not None:  # no metacharacters: exact dictionary term
            return self._scan(F.col("term") == lit)
        # '(?:...)' so alternation can't leak past the anchors — a
        # generated wrapper, not part of the user-facing subset
        pred = F.col("term").rlike("^(?:" + pattern + ")$")
        if pre:
            pred = (F.col("term") >= pre) & pred
            hi = prefix_upper_bound(pre)
            if hi is not None:
                pred = (F.col("term") < hi) & pred
        return self._scan(pred)

    # ------------------------------------------------------------------
    # combinators

    def _union(self, children: List[PlanResult]) -> PlanResult:
        if not children:
            return self._empty()
        docs = children[0].docs
        rows = children[0].rows
        raw = children[0].raw
        for c in children[1:]:
            docs = docs.unionByName(c.docs)
            rows = rows.unionByName(c.rows)
            raw = (
                raw.unionByName(c.raw)
                if raw is not None and c.raw is not None
                else None
            )
        return PlanResult(
            docs=docs.distinct(),
            rows=rows,
            complete=all(c.complete for c in children),
            raw=raw,
        )

    def _intersect(self, children: List[PlanResult]) -> PlanResult:
        """Docs in every child; positions union of child rows over them.

        One aggregation replaces the k-way zig-zag intersection
        (util/btree_map_ext.rs:22-48): tag each branch, count distinct
        branches per doc, keep docs hitting all k.
        """
        if not children:
            return self._empty()
        if len(children) == 1:
            return children[0]
        tagged = None
        for i, c in enumerate(children):
            t = c.docs.select("doc_id", F.lit(i).alias("branch"))
            tagged = t if tagged is None else tagged.unionByName(t)
        docs = (
            tagged.groupBy("doc_id")
            .agg(F.countDistinct("branch").alias("nb"))
            .filter(F.col("nb") == len(children))
            .select("doc_id")
        )
        if all(c.raw is not None for c in children):
            # semi-join BEFORE exploding: only surviving docs' position
            # arrays are ever unpacked (the dominant cost of a broad
            # conjunction is exploding the non-surviving majority)
            raw = None
            for c in children:
                raw = c.raw if raw is None else raw.unionByName(c.raw)
            raw = raw.join(F.broadcast(docs), "doc_id", "left_semi")
            rows = self._explode_raw(raw)
        else:
            raw = None
            rows = None
            for c in children:
                rows = c.rows if rows is None else rows.unionByName(c.rows)
            rows = rows.join(F.broadcast(docs), "doc_id", "left_semi")
        # every surviving doc has rows from each (complete) branch
        return PlanResult(
            docs=docs,
            rows=rows,
            complete=all(c.complete for c in children),
            raw=raw,
        )

    def _positional_pairs(
        self, terms: List[str], residual, hit_membership: bool
    ) -> PlanResult:
        """Shared pair plan for positional intersections (Phrase, Near):
        per consecutive term pair, scan both terms, prune BOTH join
        inputs to the both-terms doc intersection first (the (doc_id,
        pos-residual) equi-join then shuffles only rows of docs that can
        possibly produce a hit, not the full term scans — the dominant
        cost when one term is common and the other rare), join with
        ``residual(l.pos, r.pos)``, and union the endpoint rows.

        ``hit_membership=False`` keeps the reference Phrase quirk —
        docs containing BOTH terms stay in the result even with no hit
        (postings.rs:101-112, empty position lists score 0);
        ``True`` restricts membership to docs with >= 1 hit (Near) and
        marks the pair complete.
        """
        pairs: List[PlanResult] = []
        for t0, t1 in zip(terms, terms[1:]):
            left = self._scan(self._term_pred(t0)).rows
            right = self._scan(self._term_pred(t1)).rows
            both = (
                left.select("doc_id")
                .distinct()
                .join(right.select("doc_id").distinct(), "doc_id", "left_semi")
            )
            l = left.join(F.broadcast(both), "doc_id", "left_semi").alias("l")
            r = right.join(F.broadcast(both), "doc_id", "left_semi").alias("r")
            adj = l.join(
                r,
                (F.col("l.doc_id") == F.col("r.doc_id"))
                & residual(F.col("l.pos"), F.col("r.pos")),
            )
            rows = (
                adj.select(
                    F.col("l.doc_id").alias("doc_id"),
                    F.col("l.begin").alias("begin"),
                    F.col("l.end").alias("end"),
                    F.col("l.pos").alias("pos"),
                )
                .unionByName(
                    adj.select(
                        F.col("r.doc_id").alias("doc_id"),
                        F.col("r.begin").alias("begin"),
                        F.col("r.end").alias("end"),
                        F.col("r.pos").alias("pos"),
                    )
                )
                .distinct()
            )
            if hit_membership:
                pairs.append(
                    PlanResult(
                        docs=rows.select("doc_id").distinct(),
                        rows=rows,
                        complete=True,
                    )
                )
            else:
                pairs.append(PlanResult(docs=both, rows=rows))
        return self._intersect(pairs)

    def _phrase(self, text: str) -> PlanResult:
        terms = [t.term for t in analyze_query(text)]
        if len(terms) < 2:
            return self._empty()
        return self._positional_pairs(
            terms, lambda lp, rp: lp + 1 == rp, hit_membership=False
        )

    def _near(self, text: str, slop: int) -> PlanResult:
        """Ordered windowed proximity (qast.Near): the Phrase plan with
        the adjacency equi-join relaxed to a band join
        ``1 <= r.pos - l.pos <= slop``, and membership tightened to docs
        with >= 1 hit per pair (no zero-hit members — Near is an engine
        extension, free of the reference's Phrase quirk).

        The band join stays an equi-join on doc_id with the pos window
        as a residual condition, and both inputs are pre-pruned to the
        both-terms doc intersection, so the shuffle is the same size as
        Phrase's regardless of slop.
        """
        if slop < 1:
            raise ValueError(f"Near slop must be >= 1, got {slop}")
        terms = [t.term for t in analyze_query(text)]
        if len(terms) < 2:
            return self._empty()
        return self._positional_pairs(
            terms,
            lambda lp, rp: ((rp - lp) >= 1) & ((rp - lp) <= slop),
            hit_membership=True,
        )

    def _fuzzy(self, text: str, max_edits: int, max_expansions: int) -> PlanResult:
        """Edit-distance term expansion (qast.Fuzzy): one term-dictionary
        scan (length band sargable, ``F.levenshtein`` JVM-side) picks the
        ``max_expansions`` highest-df tokens within ``max_edits``; the
        postings scan is a broadcast semi-join on the expanded set —
        never a corpus scan, and the vocabulary scan is O(|termdict in
        the +-max_edits length band|), independent of corpus size.
        """
        if self.index.ngrams:
            raise ValueError(
                "Fuzzy requires a full-token index: an edge-ngram term "
                "dictionary stores prefixes, where edit distance over "
                "entries is meaningless (build with ngrams=False)"
            )
        terms = [t.term for t in analyze_query(text)]
        if len(terms) != 1:
            raise ValueError(
                f"Fuzzy wants exactly one analyzed term, got {terms!r}"
            )
        q = terms[0]
        cand = (
            self.index.termdict.filter(
                F.length("term").between(
                    len(q) - max_edits, len(q) + max_edits
                )
            )
            .filter(F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
            .orderBy(F.col("df_full").desc(), F.col("term").asc())
            .limit(max_expansions)
            .select("term")
        )
        raw = self.index.postings.join(
            F.broadcast(cand), "term", "left_semi"
        ).select("doc_id", "positions")
        return PlanResult(
            docs=raw.select("doc_id").distinct(),
            rows=self._explode_raw(raw),
            complete=True,
            raw=raw,
        )

    def _phonetic(self, text: str, max_expansions: int) -> PlanResult:
        """Sounds-like term expansion (qast.Phonetic): one
        term-dictionary scan picks the ``max_expansions`` highest-df
        tokens whose ``F.soundex`` equals the query term's code
        (oracle.soundex — parity pinned in tests); the postings scan is
        a broadcast semi-join on the expanded set. The scan is sargable
        on the code's first letter (a soundex code starts with the
        term's first letter), so it reads one letter's slice of the
        vocabulary, never all of it.
        """
        if self.index.ngrams:
            raise ValueError(
                "Phonetic requires a full-token index: an edge-ngram "
                "term dictionary stores prefixes, where soundex over "
                "entries is meaningless (build with ngrams=False)"
            )
        terms = [t.term for t in analyze_query(text)]
        if len(terms) != 1:
            raise ValueError(
                f"Phonetic wants exactly one analyzed term, got {terms!r}"
            )
        from .oracle import soundex

        q = terms[0]
        code = soundex(q)
        cand = self.index.termdict
        first = q[0] if q else ""
        # RAW ASCII-letter check, mirroring oracle.soundex: a char that
        # only full-Unicode-uppercases into A-Z ('ß' -> 'SS') is not a
        # band letter (and would crash chr(ord(...)+1) on the 2-char
        # uppercase result)
        if ("a" <= first <= "z") or ("A" <= first <= "Z"):
            lo = first.lower()
            hi = chr(ord(lo) + 1)
            cand = cand.filter(
                (F.col("term") >= lo) & (F.col("term") < hi)
            )
        else:
            # non-letter-initial query: its "code" is the raw string,
            # which only an identical term can produce (see
            # oracle.soundex) — the scan is an exact-term lookup
            cand = cand.filter(F.col("term") == q)
        cand = (
            cand.filter(F.soundex(F.col("term")) == F.lit(code))
            .orderBy(F.col("df_full").desc(), F.col("term").asc())
            .limit(max_expansions)
            .select("term")
        )
        raw = self.index.postings.join(
            F.broadcast(cand), "term", "left_semi"
        ).select("doc_id", "positions")
        return PlanResult(
            docs=raw.select("doc_id").distinct(),
            rows=self._explode_raw(raw),
            complete=True,
            raw=raw,
        )

    def _subtract(self, pos: PlanResult, neg: PlanResult) -> PlanResult:
        """AndNot: positive's docs/rows minus the negative's doc set.

        One anti-join on doc_id (left to Catalyst/AQE to pick the
        strategy — the negative of a hot term can be far too large to
        broadcast). Positions and score stay the positive's; complete
        is inherited because removing whole docs can't orphan members.
        """
        docs = pos.docs.join(neg.docs, "doc_id", "left_anti")
        if pos.raw is not None:
            raw = pos.raw.join(neg.docs, "doc_id", "left_anti")
            return PlanResult(
                docs=docs,
                rows=self._explode_raw(raw),
                complete=pos.complete,
                raw=raw,
            )
        rows = pos.rows.join(neg.docs, "doc_id", "left_anti")
        return PlanResult(docs=docs, rows=rows, complete=pos.complete)

    def _at_least(self, m: int, children: List[PlanResult]) -> PlanResult:
        """AtLeast: docs matched by >= m children (qast.AtLeast).

        The m=1 / m=n ends collapse to the existing union/intersection
        combinators; in between it is the _intersect plan with the
        HAVING threshold relaxed from == n to >= m — one branch-tagged
        membership aggregation, then the row/raw union semi-joined to
        the surviving docs. Rows of a child the doc did NOT match can't
        leak in: a child only has rows where it has membership.
        """
        if m > len(children):
            return self._empty()
        if m == 1:
            return self._union(children)
        if m == len(children):
            return self._intersect(children)
        tagged = None
        for i, c in enumerate(children):
            t = c.docs.select("doc_id", F.lit(i).alias("branch"))
            tagged = t if tagged is None else tagged.unionByName(t)
        docs = (
            tagged.groupBy("doc_id")
            .agg(F.countDistinct("branch").alias("nb"))
            .filter(F.col("nb") >= m)
            .select("doc_id")
        )
        if all(c.raw is not None for c in children):
            raw = None
            for c in children:
                raw = c.raw if raw is None else raw.unionByName(c.raw)
            raw = raw.join(F.broadcast(docs), "doc_id", "left_semi")
            rows = self._explode_raw(raw)
        else:
            raw = None
            rows = None
            for c in children:
                rows = c.rows if rows is None else rows.unionByName(c.rows)
            rows = rows.join(F.broadcast(docs), "doc_id", "left_semi")
        # a member doc matched >= m >= 1 complete children, so it has
        # rows whenever every child is complete (zero-row membership
        # can only enter through a Phrase child's quirk)
        return PlanResult(
            docs=docs,
            rows=rows,
            complete=all(c.complete for c in children),
            raw=raw,
        )

    def compile(self, query: Query) -> PlanResult:
        if isinstance(query, Match):
            return self._match(query.text)
        if isinstance(query, Prefix):
            return self._prefix(query.text)
        if isinstance(query, Wildcard):
            return self._wildcard(query.pattern)
        if isinstance(query, Regex):
            return self._regex(query.pattern)
        if isinstance(query, Phrase):
            return self._phrase(query.text)
        if isinstance(query, Near):
            return self._near(query.text, query.slop)
        if isinstance(query, Fuzzy):
            return self._fuzzy(
                query.text, query.max_edits, query.max_expansions
            )
        if isinstance(query, Phonetic):
            return self._phonetic(query.text, query.max_expansions)
        if isinstance(query, And):
            return self._intersect([self.compile(q) for q in query.children])
        if isinstance(query, Or):
            return self._union([self.compile(q) for q in query.children])
        if isinstance(query, AndNot):
            return self._subtract(
                self.compile(query.positive), self.compile(query.negative)
            )
        if isinstance(query, AtLeast):
            return self._at_least(
                query.m, [self.compile(q) for q in query.children]
            )
        raise TypeError(f"unknown query node: {query!r}")

    # ------------------------------------------------------------------
    # coalescing + scoring

    @staticmethod
    def coalesce_rows(rows: DataFrame) -> DataFrame:
        """Neighbor-only position coalescing as a window computation.

        Islands within a doc: consecutive rows (in (begin, end, pos)
        order) with the same ordinal whose ranges chain-overlap/touch.
        Exactly reproduces the reference's insert-time neighbor merge
        (util/coalesce.rs:32-73): a row merges only with its immediate
        predecessor's accumulated interval, and a different ordinal in
        between breaks the chain.
        """
        w = Window.partitionBy("doc_id").orderBy("begin", "end", "pos")
        pos_changed = (
            F.lag("pos").over(w).isNull() | (F.col("pos") != F.lag("pos").over(w))
        )
        rows = rows.withColumn(
            "run_id",
            F.sum(F.when(pos_changed, 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        wr = Window.partitionBy("doc_id", "run_id").orderBy("begin", "end", "pos")
        prev_end = F.max("end").over(
            wr.rowsBetween(Window.unboundedPreceding, -1)
        )
        new_island = prev_end.isNull() | (F.col("begin") > prev_end)
        rows = rows.withColumn(
            "island_id",
            F.sum(F.when(new_island, 1).otherwise(0)).over(
                wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return rows.groupBy("doc_id", "run_id", "island_id").agg(
            F.min("begin").alias("begin"),
            F.max("end").alias("end"),
            F.min("pos").alias("pos"),
        ).select(*ROW_COLS)

    def _restrict(
        self, plan: PlanResult, filter_docs: DataFrame
    ) -> PlanResult:
        """Metadata filter: keep only docs present in ``filter_docs``.

        One semi-join per branch on doc_id; scoring statistics (idf,
        avgdl, N) stay GLOBAL — the filter restricts candidates, it does
        not re-weight the corpus (the standard filter-query contract:
        Lucene filters, SQL WHERE over a ranked subquery)."""
        allowed = filter_docs.select("doc_id").distinct()
        raw = (
            plan.raw.join(allowed, "doc_id", "left_semi")
            if plan.raw is not None
            else None
        )
        return PlanResult(
            docs=plan.docs.join(allowed, "doc_id", "left_semi"),
            rows=plan.rows.join(allowed, "doc_id", "left_semi"),
            complete=plan.complete,
            raw=raw,
        )

    def results(
        self,
        query: Query,
        k: Optional[int] = None,
        with_positions: bool = True,
        filter_docs: Optional[DataFrame] = None,
        doc_range: Optional[tuple] = None,
    ) -> DataFrame:
        """Execute a query -> (doc_id, score, [positions]).

        Parity score: float32 sum(coalesced widths)/sqrt(doc bytes)
        (search_result.rs:19-28); order score desc, doc_id asc
        (index.rs:148-156).

        Position materialization is TWO-PASS when ``k`` is set and the
        plan is complete (Match/Or/Prefix/And of scans): pass 1 scores
        every matching doc WITHOUT building position arrays (widths
        only — stays in whole-stage codegen) and takes the top-k;
        pass 2 re-reads only the k winners' rows (broadcast semi-join
        pushes the doc filter into the scan) and coalesces their
        positions. A broad query therefore never collect_lists position
        arrays corpus-wide just to throw away all but k of them.
        Incomplete plans (Phrase) stay single-pass: their rows are
        already reduced by the adjacency join, so re-executing that
        join for a second pass would cost more than the small
        collect_list it avoids. ``k=None`` + ``with_positions=True``
        keeps the single-pass shape too (every doc's positions are
        genuinely wanted).

        With fresh POSITIONAL segments the whole query routes to
        ``segquery.segment_query`` — bit-identical results (scores,
        order, position arrays; asserted in tests) served from the
        compressed shards without touching the postings parquet.

        ``filter_docs`` (optional, one doc_id column) restricts results
        to those docs — derive it from any metadata predicate
        (``docs.filter(...).select("doc_id")``). Filtered queries pin
        the relational plan: exact filtered top-k needs the filter
        applied before the limit, which the segment kernels don't see.
        ``doc_range=(lo, hi)`` restricts to doc ids in [lo, hi) and
        STAYS on the segment route — the window prunes whole shard
        files structurally and masks boundary shards in-kernel
        (time-scoped positional search over time-ordered ids).
        """
        seg = (
            self._segment_path(positional=True)
            if filter_docs is None
            else None
        )
        if seg is not None:
            from .segquery import WildcardTooBroad, segment_query

            try:
                return segment_query(
                    self.index.docstats.sparkSession,
                    seg,
                    query,
                    k=k,
                    with_positions=with_positions,
                    doc_range=doc_range,
                )
            except WildcardTooBroad:
                # a broad Wildcard costs more to expand per-term than to
                # scan: the relational anchored-rlike plan is one pass
                pass
        plan = self.compile(query)
        if doc_range is not None:
            pred = (F.col("doc_id") >= int(doc_range[0])) & (
                F.col("doc_id") < int(doc_range[1])
            )
            plan = PlanResult(
                docs=plan.docs.filter(pred),
                rows=plan.rows.filter(pred),
                complete=plan.complete,
                raw=plan.raw.filter(pred) if plan.raw is not None else None,
            )
        if filter_docs is not None:
            plan = self._restrict(plan, filter_docs)
        two_pass = with_positions and k is not None and plan.complete
        coalesced = self.coalesce_rows(plan.rows)
        # ONE aggregation produces width AND (single-pass only) the
        # position array — and it reuses the coalesce windows' hash
        # partitioning on doc_id, so the whole post-scan pipeline is a
        # single exchange. The membership join (with its duplicated
        # subtree) only exists for plans where a doc can match with
        # zero rows (Phrase, see PlanResult.complete).
        aggs = [F.sum(F.col("end") - F.col("begin")).alias("width")]
        if with_positions and not two_pass:
            aggs.append(
                F.sort_array(
                    F.collect_list(F.struct("begin", "end", "pos"))
                ).alias("positions")
            )
        per_doc = coalesced.groupBy("doc_id").agg(*aggs)
        if not plan.complete:
            per_doc = plan.docs.join(per_doc, "doc_id", "left").fillna(
                {"width": 0}
            )
        scored = (
            per_doc.join(
                self.index.docstats.select("doc_id", "doclen_bytes"), "doc_id"
            )
            .withColumn(
                "score",
                (
                    F.col("width").cast("float")
                    / F.sqrt(F.col("doclen_bytes").cast("double")).cast("float")
                ).cast("float"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        if k is not None:
            scored = scored.limit(k)
        if not with_positions:
            return scored.select("doc_id", "score")
        empty_pos = F.array().cast("array<struct<begin:int,end:int,pos:int>>")
        if two_pass:
            winners = scored.select("doc_id", "score")
            if plan.raw is not None:
                # prune to the k winners BEFORE exploding position arrays
                win_rows = self._explode_raw(
                    plan.raw.join(
                        F.broadcast(winners.select("doc_id")),
                        "doc_id",
                        "left_semi",
                    )
                )
            else:
                win_rows = plan.rows.join(
                    F.broadcast(winners.select("doc_id")),
                    "doc_id",
                    "left_semi",
                )
            win_pos = (
                self.coalesce_rows(win_rows)
                .groupBy("doc_id")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("begin", "end", "pos"))
                    ).alias("positions")
                )
            )
            return (
                winners.join(win_pos, "doc_id", "left")
                .select(
                    "doc_id",
                    "score",
                    F.coalesce(F.col("positions"), empty_pos).alias(
                        "positions"
                    ),
                )
                .orderBy(F.desc("score"), F.asc("doc_id"))
            )
        return scored.select(
            "doc_id",
            "score",
            F.coalesce(F.col("positions"), empty_pos).alias("positions"),
        )

    def search(
        self,
        text: str,
        k: Optional[int] = None,
        filter_docs: Optional[DataFrame] = None,
        doc_range: Optional[tuple] = None,
    ) -> DataFrame:
        """Reference ``search`` = query(Match(text)) (index.rs:72-74)."""
        return self.results(
            Match(text), k=k, filter_docs=filter_docs, doc_range=doc_range
        )

    def explain(self, query, filtered: bool = False) -> dict:
        """Routing + plan preview for a query — zero Spark jobs.

        Accepts a ``Query`` AST or a query STRING (parsed with the query
        language). Reports which path :meth:`results` would take
        (``route``: "segments" | "relational" and why), and for the
        segment route embeds ``segquery.explain_segment_query``'s full
        preview (pruned shard list, per-range df/fan-out/cost, the
        local-vs-spark serving decision). ``filtered=True`` previews a
        call that will pass ``filter_docs`` (which pins the relational
        plan) without needing the frame itself.
        """
        from .qparse import parse_query

        q = parse_query(query) if isinstance(query, str) else query
        out: dict = {"query": repr(q)}
        if filtered:
            out.update(
                route="relational",
                reason="filter_docs pins the relational plan (exact "
                "filtered top-k needs the filter before the limit)",
            )
            return out
        seg = self._segment_path(positional=True)
        if seg is None:
            path = getattr(self.index, "path", None)
            out.update(
                route="relational",
                reason=(
                    "use_segments=False" if not self.use_segments
                    else "index has no path (in-memory build)" if not path
                    else "segments missing or stale (run build_segments/"
                    "refresh_segments)"
                ),
            )
            return out
        from .segquery import WildcardTooBroad, explain_segment_query

        try:
            preview = explain_segment_query(seg, q)
        except WildcardTooBroad as exc:
            out.update(route="relational", reason=str(exc))
            return out
        out.update(route="segments", reason="fresh positional segments")
        out.update(preview)
        return out

    def count(self, query: Query) -> int:
        """Number of matching docs — membership only, no positions.

        With fresh positional segments the count is served by
        ``segquery.segment_count`` (pruned shard set, membership-only
        kernels, driver-side with zero Spark jobs when the pruned read
        is small — the common rare-term case). The relational fallback
        is the query's docs branch (Catalyst prunes the positions
        column out of the scan entirely) under a partial count.
        """
        seg = self._segment_path(positional=True)
        if seg is not None:
            from .segquery import WildcardTooBroad, segment_count

            try:
                return segment_count(
                    self.index.docstats.sparkSession, seg, query
                )
            except WildcardTooBroad:
                pass
        return self.compile(query).docs.count()

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 10,
        exclude_self: bool = True,
    ) -> DataFrame:
        """Similar-document retrieval (Lucene MoreLikeThis shape):
        pick the source doc's ``max_query_terms`` most significant full
        tokens by tf x BM25-idf (ties: term asc), run them as a BM25
        query, drop the source doc itself.

        Scale shape: the source doc's text is ONE sargable row fetch
        from the doc store, tokenized driver-side (a single document is
        always driver-sized); term df comes from the termdict — read
        with zero Spark jobs via metacache when the index is saved,
        else one tiny filtered collect. Only the final BM25 scan is a
        distributed job, identical in cost to any user query with
        ``max_query_terms`` terms.
        """
        if self.index.docs is None:
            raise ValueError(
                "more_like_this needs the doc store (store_docs=True or "
                "docs= attached to the index)"
            )
        rows = (
            self.index.docs.filter(F.col("doc_id") == doc_id)
            .select("text")
            .take(1)
        )
        if not rows:
            raise ValueError(f"doc_id {doc_id} not in the doc store")
        from collections import Counter

        from .analysis import analyze_index

        tf = Counter(t.term for t in analyze_index(rows[0]["text"], ngrams=False))
        if not tf:
            return self.bm25("", k=k)
        path = getattr(self.index, "path", None)
        if path:
            from . import metacache

            dfs = metacache.term_dfs(path, list(tf))
        else:
            dfs = {
                r["term"]: r["df_full"]
                for r in self.index.termdict.filter(
                    F.col("term").isin(list(tf))
                )
                .select("term", "df_full")
                .collect()
            }
        import math

        n = self.index.n_docs
        scored = sorted(
            (
                (
                    -c * math.log((n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0),
                    t,
                )
                for t, c in tf.items()
                if dfs.get(t, 0) > 0
            ),
        )[:max_query_terms]
        terms = [t for _, t in scored]
        if not terms:
            return self.bm25("", k=k)
        # over-fetch one row so dropping the source still yields k —
        # keeps the WAND segment route (which needs a concrete k) hot
        fetch = (k + 1) if (k is not None and exclude_self) else k
        out = self.bm25(" ".join(terms), k=fetch)
        if exclude_self:
            out = out.filter(F.col("doc_id") != doc_id)
        if k is not None:
            # re-assert rank order before the final limit: the WAND
            # local-serving branch returns a createDataFrame relation
            # whose plan has no sort, so limit-after-filter preserving
            # rank would otherwise rest on partition-order luck
            out = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return out

    def term_vector(self, doc_id: int) -> DataFrame:
        """Per-document term vector (Lucene TermVectors analog): one
        row per distinct analyzed term of the doc with its in-doc
        ``tf``, corpus ``df`` (docs containing the dictionary entry)
        and byte-offset ``positions``, term-sorted.

        Scale shape (cf. :meth:`more_like_this`): ONE sargable
        doc-store row fetch, driver-side re-analysis (a single document
        is always driver-sized), dfs via the metacache with zero Spark
        jobs on a saved index — the result is a driver-built local
        relation, so there is no distributed work beyond the row fetch.

        Terms reflect the INDEX analyzer (stored edge-ngrams on parity
        indexes, full tokens otherwise): the vector lists exactly the
        dictionary entries this doc contributed to, with df counted per
        dictionary entry (termdict ``df``, which equals ``df_full`` on
        full-token indexes).
        """
        if self.index.docs is None:
            raise ValueError(
                "term_vector needs the doc store (store_docs=True or "
                "docs= attached to the index)"
            )
        rows = (
            self.index.docs.filter(F.col("doc_id") == doc_id)
            .select("text")
            .take(1)
        )
        if not rows:
            raise ValueError(f"doc_id {doc_id} not in the doc store")
        from .analysis import analyze_index

        by_term: dict = {}
        for tok in analyze_index(rows[0]["text"], ngrams=self.index.ngrams):
            by_term.setdefault(tok.term, []).append(
                (tok.begin, tok.end, tok.pos)
            )
        spark = self.index.docstats.sparkSession
        schema = (
            "term string, tf long, df long, "
            "positions array<struct<begin:int,end:int,pos:int>>"
        )
        if not by_term:
            return spark.createDataFrame([], schema)
        path = getattr(self.index, "path", None)
        if path:
            from . import metacache

            dfs = metacache.term_dfs(path, list(by_term), column="df")
        else:
            dfs = {
                r["term"]: r["df"]
                for r in self.index.termdict.filter(
                    F.col("term").isin(list(by_term))
                )
                .select("term", "df")
                .collect()
            }
        data = [
            (t, len(ps), int(dfs.get(t, 0)), ps)
            for t, ps in sorted(by_term.items())
        ]
        return spark.createDataFrame(data, schema)

    _HISTOGRAM_INTERVALS = (
        "year", "quarter", "month", "week", "day", "hour", "minute",
    )

    def date_histogram(
        self,
        query: Query,
        meta: DataFrame,
        ts_col: str = "ts",
        interval: str = "hour",
    ) -> DataFrame:
        """Time-bucketed counts over a query's match set ->
        (bucket timestamp, n_docs) — the search-UI date histogram
        (results-over-time bar chart; Lucene/ES ``date_histogram``
        aggregation shape).

        Membership only (the plan's docs branch — positions never
        decoded) joined to ``meta`` (doc_id + the timestamp column),
        truncated with the built-in ``date_trunc`` (stays in
        whole-stage codegen) and counted in one partial-agg pass.
        Empty buckets are not emitted (sparse histogram; densify with
        a range join against a calendar frame if a UI needs zeros).
        """
        if interval not in self._HISTOGRAM_INTERVALS:
            raise ValueError(
                f"interval must be one of {self._HISTOGRAM_INTERVALS}, "
                f"got {interval!r}"
            )
        if ts_col not in meta.columns:
            raise ValueError(f"timestamp column {ts_col!r} not in meta")
        docs = self.compile(query).docs
        return (
            docs.join(meta.select("doc_id", ts_col), "doc_id")
            .groupBy(
                F.date_trunc(interval, F.col(ts_col)).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    def bm25_after(
        self,
        text: str,
        k: int = 10,
        after: Optional[tuple] = None,
        filter_docs: Optional[DataFrame] = None,
        doc_range: Optional[tuple] = None,
    ) -> DataFrame:
        """Cursor pagination over the BM25 ranking (``search_after``):
        the next ``k`` results STRICTLY AFTER the cursor
        ``after=(score, doc_id)`` in (score desc, doc_id asc) order.

        Page 1 is ``bm25(text, k)``; each later page passes the last
        row of the previous page as the cursor. Cursor-based paging is
        stable under concurrent result-set growth (unlike offset
        paging) and never recomputes earlier pages' positions. The
        cursor predicate is ``score < s OR (score = s AND doc_id >
        d)`` — exact against the engine's own deterministic scores
        (the total order's tie-break is doc_id asc). Scoring runs the
        relational plan with ``k=None`` (exact paging needs the filter
        before the limit); a WAND variant could seed its threshold
        with ``s`` since every page-2 score is <= s, but ties at the
        threshold need doc_id-aware skipping, so the exact path is
        pinned here.
        """
        if after is None:
            return self.bm25(
                text, k=k, filter_docs=filter_docs, doc_range=doc_range
            )
        s, d = float(after[0]), int(after[1])
        full = self.bm25(
            text, k=None, filter_docs=filter_docs, doc_range=doc_range
        )
        return (
            full.filter(
                (F.col("score") < F.lit(s))
                | ((F.col("score") == F.lit(s)) & (F.col("doc_id") > F.lit(d)))
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def results_by_field(
        self,
        query: Query,
        meta: DataFrame,
        col: str,
        k: int = 10,
        ascending: bool = False,
    ) -> DataFrame:
        """Top-k matches ordered by a METADATA field instead of score
        (the search-UI "sort by date" toggle) -> (doc_id, <col>).

        Membership only (the plan's docs branch — relevance is not
        computed at all, and positions are never decoded) joined to
        ``meta``; the sort+limit compiles to TakeOrderedAndProject
        (per-partition top-k, k rows per partition shipped — never a
        global sort). Ties break doc_id asc, so paging is
        deterministic.
        """
        if col not in meta.columns:
            raise ValueError(f"sort column {col!r} not in meta")
        docs = self.compile(query).docs
        order = [
            F.asc(col) if ascending else F.desc(col),
            F.asc("doc_id"),
        ]
        return (
            docs.join(meta.select("doc_id", col), "doc_id")
            .orderBy(*order)
            .limit(k)
        )

    def collapse(
        self,
        text: str,
        meta: DataFrame,
        field: str,
        k: int = 10,
        hits_per_group: int = 1,
    ) -> DataFrame:
        """Field collapsing (Lucene/ES ``collapse``): the BM25 ranking
        with at most ``hits_per_group`` results per ``field`` value ->
        (doc_id, score, <field>) — "best turn per conversation" dedup
        of a result list.

        Scores every matching doc (relational plan, ``k=None`` — the
        group winners may rank arbitrarily deep, so a top-k prefetch
        cannot be exact), joins the collapse field, keeps each group's
        best ``hits_per_group`` by (score desc, doc_id asc), then
        returns the global top-k of the survivors in the same order.
        One window over |matches| rows partitioned by the field — no
        self-join, no per-group subquery.
        """
        if field not in meta.columns:
            raise ValueError(f"collapse field {field!r} not in meta")
        if hits_per_group < 1:
            raise ValueError("hits_per_group must be >= 1")
        scored = self.bm25(text, k=None)
        joined = scored.join(meta.select("doc_id", field), "doc_id")
        win = Window.partitionBy(field).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            joined.withColumn("_r", F.row_number().over(win))
            .filter(F.col("_r") <= hits_per_group)
            .drop("_r")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def facet_top_hits(
        self,
        text: str,
        meta: DataFrame,
        field: str,
        k: int = 3,
    ) -> DataFrame:
        """Per-bucket ranked hits (ES ``terms`` agg + ``top_hits``
        sub-agg): for every ``field`` value WITH AT LEAST ONE MATCH,
        that bucket's top-``k`` BM25 results -> (<field>, rank,
        doc_id, score) ordered value asc, rank asc — "best three turns
        per tool" in one query. Buckets whose docs all miss the query
        are absent (ES terms-agg-over-hits semantics: buckets come
        from the hit set), as are matched docs missing from ``meta``.

        Differs from :meth:`collapse` (which is a global ranking
        deduped per group): here the buckets themselves are the output
        and no global limit applies, so a low-scoring bucket still
        surfaces its best hits instead of being crowded out.

        Plan: score every matching doc once (relational BM25,
        ``k=None``), one |matches|-sized join to the facet column, one
        row_number window partitioned by the field. A hot bucket is a
        window partition, not a join key, so skew costs a partial sort,
        never a shuffle explosion — the same envelope as ``collapse``.
        """
        if field not in meta.columns:
            raise ValueError(f"top_hits field {field!r} not in meta")
        if field == "doc_id":
            # doc_id would pass the membership check but makes
            # meta.select("doc_id", field) a duplicate-column frame and
            # the window partition ambiguous; every doc is its own
            # bucket anyway, which is bm25(k=None) with rank=1
            raise ValueError(
                "top_hits field must be a facet column, not 'doc_id' "
                "(grouping by doc_id puts every doc in its own bucket "
                "— use bm25() directly)"
            )
        if k < 1:
            raise ValueError("k must be >= 1")
        scored = self.bm25(text, k=None)
        joined = scored.join(meta.select("doc_id", field), "doc_id")
        win = Window.partitionBy(field).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            joined.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(field, "rank", "doc_id", "score")
            .orderBy(F.asc(field), F.asc("rank"))
        )

    def _require_fulltoken(self, what: str) -> None:
        if self.index.ngrams:
            raise ValueError(
                f"{what} requires a full-token index: an edge-ngram "
                "term dictionary stores prefixes, not real vocabulary "
                "entries (build with ngrams=False)"
            )

    def suggest(
        self, text: str, max_edits: int = 2, k: int = 3
    ) -> DataFrame:
        """Did-you-mean spelling suggestions per analyzed query term.

        For each query term, the ``k`` dictionary tokens within
        Levenshtein distance ``max_edits``, ranked (dist asc, df desc,
        term asc) — Lucene DirectSpellChecker's contract, as an engine
        EXTENSION (the reference has no suggester). A term indexed
        exactly suggests itself first at dist 0, so callers can gate on
        ``dist > 0`` for the classic "did you mean" banner.

        Plan: ONE term-dictionary scan, length-banded (|len(cand) -
        len(q)| <= max_edits — a necessary condition for edit distance,
        so no sound candidate is lost) against the broadcast query-term
        list, JVM-side ``F.levenshtein``, then a per-term top-k window.
        Cost is O(vocab in the length bands), independent of corpus
        row count — the same envelope as Fuzzy expansion.

        Returns (qterm, suggestion, dist, df, rank), ordered qterm asc,
        rank asc.
        """
        self._require_fulltoken("suggest")
        qterms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in qterms:
                qterms.append(tok.term)
        spark = self.index.docstats.sparkSession
        if not qterms:
            return spark.createDataFrame(
                [], "qterm string, suggestion string, dist int, "
                    "df long, rank int"
            )
        q_df = spark.createDataFrame([(t,) for t in qterms], "qterm string")
        cand = (
            self.index.termdict.filter(F.col("df_full") > 0)
            .select("term", F.col("df_full").alias("df"))
            .join(
                F.broadcast(q_df),
                F.length("term").between(
                    F.length("qterm") - max_edits,
                    F.length("qterm") + max_edits,
                ),
            )
            .withColumn("dist", F.levenshtein(F.col("term"), F.col("qterm")))
            .filter(F.col("dist") <= max_edits)
        )
        win = Window.partitionBy("qterm").orderBy(
            F.asc("dist"), F.desc("df"), F.asc("term")
        )
        return (
            cand.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(
                "qterm",
                F.col("term").alias("suggestion"),
                "dist",
                "df",
                "rank",
            )
            .orderBy(F.asc("qterm"), F.asc("rank"))
        )

    def significant_terms(
        self,
        query: Query,
        k: int = 20,
        min_doc_count: int = 3,
    ) -> DataFrame:
        """Terms overrepresented in the query's result set vs the corpus
        (Elasticsearch significant_terms analog; JLH score).

        fg_rate = fg_df / |result docs|, bg_rate = df_full / N;
        score = (fg_rate - bg_rate) * (fg_rate / bg_rate). Terms seen in
        fewer than ``min_doc_count`` result docs are dropped (rare-term
        noise floor). Engine EXTENSION — returns (term, fg_df, bg_df,
        score), score desc, term asc, top-k.

        Plan: membership docs from the compiled query, one postings
        semi-join + per-term count for the foreground df (map-side
        partial agg), broadcast termdict join for the background df.
        The only corpus-wide pass is the postings semi-join, which
        Catalyst/AQE shuffles on the already-partitioned term key.
        """
        self._require_fulltoken("significant_terms")
        fg = self.compile(query).docs
        fg_n = fg.count()
        spark = self.index.docstats.sparkSession
        if fg_n == 0:
            return spark.createDataFrame(
                [], "term string, fg_df long, bg_df long, score double"
            )
        n = float(self.index.n_docs)
        fg_df = (
            self.index.postings.filter(F.col("tf") > 0)
            .select("term", "doc_id")
            .join(fg, "doc_id", "left_semi")
            .groupBy("term")
            .agg(F.count("*").alias("fg_df"))
            .filter(F.col("fg_df") >= min_doc_count)
        )
        joined = fg_df.join(
            self.index.termdict.select(
                "term", F.col("df_full").alias("bg_df")
            ),
            "term",
        )
        fg_rate = F.col("fg_df") / F.lit(float(fg_n))
        bg_rate = F.col("bg_df") / F.lit(n)
        return (
            joined.withColumn(
                "score", (fg_rate - bg_rate) * (fg_rate / bg_rate)
            )
            .orderBy(F.desc("score"), F.asc("term"))
            .limit(k)
        )

    def explain_bm25(self, text: str, k: int = 10) -> DataFrame:
        """Score explanation: the BM25 top-k with each doc's score
        unrolled into its per-term contributions — the serving-side
        "why did this hit rank here" surface (Lucene Explanation
        analog; engine EXTENSION).

        Returns one row per (doc, query term with tf > 0):
        (doc_id, score, term, tf, df, idf, contrib) where
        score = sum(contrib) over the doc's rows and contrib is
        exactly the relational scorer's arithmetic
        (idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))),
        so sums reproduce ``bm25`` bit-for-bit. Ordered score desc,
        doc_id asc, term asc.

        Plan: the bm25 per-term frame computed once, aggregated for the
        top-k doc set (TakeOrderedAndProject), then semi-joined back to
        itself — two passes over the pruned postings scan, k rows wide
        on the second.
        """
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        spark = self.index.docstats.sparkSession
        schema = (
            "doc_id long, score double, term string, tf double, "
            "df double, idf double, contrib double"
        )
        if not terms:
            return spark.createDataFrame([], schema)
        n, avgdl = float(self.index.n_docs), float(self.index.avgdl)
        matched = self.index.postings.filter(
            F.col("term").isin(terms) & (F.col("tf") > 0)
        ).select("term", "doc_id", "tf")
        df_tbl = self.index.termdict.filter(F.col("term").isin(terms)).select(
            "term", F.col("df_full").alias("df")
        )
        idf = F.log(
            (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        per_term = (
            matched.join(F.broadcast(df_tbl), "term")
            .join(
                self.index.docstats.select("doc_id", "doclen_tokens"),
                "doc_id",
            )
            .withColumn("idf", idf)
            .withColumn(
                "contrib",
                F.col("idf")
                * F.col("tf")
                * (K1 + 1.0)
                / (
                    F.col("tf")
                    + K1
                    * (1.0 - B + B * F.col("doclen_tokens") / F.lit(avgdl))
                ),
            )
        )
        top = (
            per_term.groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        return (
            per_term.join(F.broadcast(top), "doc_id")
            .select(
                "doc_id",
                "score",
                "term",
                F.col("tf").cast("double").alias("tf"),
                F.col("df").cast("double").alias("df"),
                "idf",
                "contrib",
            )
            .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("term"))
        )

    def min_window(
        self,
        text: str,
        window: Optional[int] = None,
        filter_docs: Optional[DataFrame] = None,
        doc_ids: Optional[List[int]] = None,
    ) -> DataFrame:
        """Unordered proximity: per doc containing ALL the analyzed
        terms (each Match-expanded like And), the size of the smallest
        position window covering every term — ``span = max(pos) -
        min(pos) + 1`` minimized over one position choice per term
        (Lucene unordered SpanNearQuery / interval "minimum window"
        semantics; engine EXTENSION). ``window`` filters to
        ``span <= window``. Returns (doc_id, span), doc_id asc.

        Plan: per-term postings scans tagged with a term ordinal,
        And-pruned to the all-terms doc intersection FIRST (the
        candidate set — identical envelope to And), then ONE
        collect_list aggregation packs each candidate doc's (pos, tid)
        rows into an array and a scalar Arrow-batched pandas UDF runs
        the classic two-pointer sliding-window scan per doc (O(rows log
        rows) for the sort) — no per-group Python task overhead, the
        doc-id hash partitioning is the only exchange. Only candidate
        docs' positions ever reach Python; a single term degenerates to
        span=1 membership with no Python stage.

        ``filter_docs`` (one doc_id column) restricts the computation
        to those docs BEFORE the candidate aggregation — the rescore
        path passes its top-``window`` set here, so only window-many
        docs' positions are ever packed, regardless of corpus size.
        ``doc_ids`` is the bounded driver-side form of the same filter:
        with fresh positional segments the whole computation then
        serves coordinator-side (``segquery.min_window_pandas`` —
        shards pruned to the ids' ranges, zero Spark jobs); without
        segments it degrades to ``filter_docs``. An unfiltered call
        also routes to the segment evaluator when the cost gate
        (``metacache.serve_locally``) says the pruned read is small —
        corpus-dense term sets stay on the distributed relational plan.
        """
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        spark = self.index.docstats.sparkSession
        if not terms:
            return spark.createDataFrame([], "doc_id long, span int")
        seg = self._segment_path(positional=True)
        if seg is not None and filter_docs is None:
            from . import segquery

            route = doc_ids is not None
            if not route:
                # corpus-wide: serve locally only under the cost gate
                from .metacache import serve_locally
                from .qast import And as _And
                from .qast import Match as _Match

                q = (
                    _And(*[_Match(t) for t in terms])
                    if len(terms) > 1
                    else _Match(terms[0])
                )
                _, _, shards, est = segquery._plan_query(seg, q)
                route = serve_locally(shards, "auto", est_bytes=est)
            if route:
                pdf = segquery.min_window_pandas(
                    seg, text, window=window, doc_ids=doc_ids
                )
                return spark.createDataFrame(
                    pdf, "doc_id long, span int"
                ).orderBy("doc_id")
        if doc_ids is not None and filter_docs is None:
            filter_docs = spark.createDataFrame(
                [(int(d),) for d in doc_ids], "doc_id long"
            )
        keep = (
            F.broadcast(filter_docs.select("doc_id").distinct())
            if filter_docs is not None
            else None
        )
        rows = None
        for i, t in enumerate(terms):
            r = self.index.postings.filter(self._term_pred(t)).select(
                "doc_id", "positions"
            )
            if keep is not None:
                # restrict BEFORE exploding position arrays: the filter
                # set is query-sized (rescore passes its top-window), so
                # the broadcast semi-join pushes into the postings scan
                # and only surviving docs' arrays ever explode
                r = r.join(keep, "doc_id", "left_semi")
            r = r.select(
                "doc_id",
                F.explode("positions").alias("p"),
                F.lit(i).alias("tid"),
            ).select("doc_id", F.col("p.pos").alias("pos"), "tid")
            rows = r if rows is None else rows.unionByName(r)
        rows = rows.distinct()  # ngram-expansion can duplicate (doc,pos)
        cand = (
            rows.groupBy("doc_id")
            .agg(F.countDistinct("tid").alias("nt"))
            .filter(F.col("nt") == len(terms))
            .select("doc_id")
        )
        if len(terms) == 1:
            return cand.select(
                "doc_id", F.lit(1).cast("int").alias("span")
            ).orderBy("doc_id")
        pruned = rows.join(F.broadcast(cand), "doc_id", "left_semi")
        n_terms = len(terms)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def _min_span(col):
            import numpy as np
            import pandas as pd

            out = []
            for lst in col:
                pos = np.fromiter(
                    (p["pos"] for p in lst), dtype=np.int64, count=len(lst)
                )
                tid = np.fromiter(
                    (p["tid"] for p in lst), dtype=np.int64, count=len(lst)
                )
                order = np.argsort(pos, kind="mergesort")
                pos, tid = pos[order], tid[order]
                counts = np.zeros(n_terms, dtype=np.int64)
                have, lo = 0, 0
                best = np.iinfo(np.int64).max
                for hi in range(len(pos)):
                    t = tid[hi]
                    counts[t] += 1
                    if counts[t] == 1:
                        have += 1
                    while have == n_terms:
                        best = min(best, pos[hi] - pos[lo] + 1)
                        tl = tid[lo]
                        counts[tl] -= 1
                        if counts[tl] == 0:
                            have -= 1
                        lo += 1
                out.append(best)
            return pd.Series(out, dtype="int32")

        grouped = pruned.groupBy("doc_id").agg(
            F.collect_list(F.struct("pos", "tid")).alias("pt")
        )
        out = grouped.select(
            "doc_id", _min_span(F.col("pt")).alias("span")
        )
        if window is not None:
            out = out.filter(F.col("span") <= int(window))
        return out.orderBy("doc_id")

    def rescore(
        self,
        text: str,
        k: int = 10,
        window: int = 50,
        weight: float = 1.0,
    ) -> DataFrame:
        """Two-stage ranking (the Elasticsearch ``rescore`` shape):
        cheap BM25 ranks the whole corpus, then ONLY the top
        ``window`` docs are re-ranked with a proximity bonus —
        ``final = bm25 + weight / span`` where ``span`` is the minimal
        position window covering every query term (:meth:`min_window`);
        window docs where the terms never all co-occur keep their
        primary score. Returns (doc_id, score) top-k by
        (score desc, doc_id asc).

        Scale shape: the primary pass is the routed BM25 top-k (WAND
        over segments when fresh), and the proximity pass is
        min_window restricted via ``filter_docs`` to the window set —
        position arrays are decoded for at most ``window`` docs no
        matter the corpus size. That asymmetry (cheap scorer corpus-
        wide, expensive scorer on a fixed-size window) is the entire
        point of rescoring at 100 TB.
        """
        if k > window:
            raise ValueError(f"k ({k}) must be <= window ({window})")
        if weight < 0:
            raise ValueError(f"weight must be >= 0, got {weight}")
        # the window set is bounded by construction, so collect it once:
        # the proximity pass can then take the doc_ids fast path (zero
        # Spark jobs from fresh segments) and the primary pass is never
        # recomputed by the join below
        spark = self.index.docstats.sparkSession
        prim_rows = self.bm25(text, k=window).collect()
        prim = spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in prim_rows],
            "doc_id long, score double",
        )
        spans = self.min_window(
            text, doc_ids=[int(r["doc_id"]) for r in prim_rows]
        )
        return (
            prim.join(spans, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.col("score")
                    + F.when(
                        F.col("span").isNotNull(),
                        F.lit(float(weight)) / F.col("span"),
                    ).otherwise(F.lit(0.0))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def span_first(self, text: str, end: int) -> DataFrame:
        """Positional gate (Lucene ``SpanFirstQuery`` analog): docs
        where the query matches within the first ``end`` token
        positions — "the term appears in the opening of the document"
        (title-ish boost precursor, lead-paragraph filters; for
        transcripts: conversations that OPEN with the topic).

        ``text`` analyzes to one or more terms, each Match-expanded
        exactly like :class:`~inverted_index_spark.qast.Match` (prefix
        semantics, index.rs:81); a doc qualifies when ANY expanded
        term has an occurrence with token position < ``end``. Returns
        (doc_id, first_pos) where ``first_pos`` is the earliest
        qualifying position, ordered by doc_id.

        Plan: one term-pruned postings scan; the position test is an
        in-plan array expression (``filter``/``transform``/
        ``array_min`` over the packed positions struct — no explode,
        no Python, whole-stage codegen), then a doc_id partial agg.
        Cost is O(matching postings rows), never corpus-wide.
        """
        if end <= 0:
            raise ValueError(f"end must be positive, got {end}")
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        spark = self.index.docstats.sparkSession
        if not terms:
            return spark.createDataFrame([], "doc_id long, first_pos int")
        pred = self._term_pred(terms[0])
        for t in terms[1:]:
            pred = pred | self._term_pred(t)
        first = F.array_min(
            F.transform(
                F.filter(
                    F.col("positions"), lambda p: p["pos"] < F.lit(int(end))
                ),
                lambda p: p["pos"],
            )
        )
        return (
            self.index.postings.filter(pred & (F.col("tf") > 0))
            .select("doc_id", first.alias("fp"))
            .filter(F.col("fp").isNotNull())
            .groupBy("doc_id")
            .agg(F.min("fp").cast("int").alias("first_pos"))
            .orderBy("doc_id")
        )

    def facets(
        self,
        query: Query,
        meta: DataFrame,
        cols: List[str],
    ) -> DataFrame:
        """Facet counts over a query's match set -> (facet, value, n_docs).

        The aggregation a search UI renders next to results ("1,204 in
        role=assistant, 310 in role=tool, ..."): docs matching ``query``
        (MEMBERSHIP ONLY — the plan's docs branch, so position arrays
        are never decoded or exploded) joined to ``meta`` (doc_id + the
        facet columns), then ONE pass over the joined rows — each row
        explodes to its (facet, value) pairs via a literal map, and a
        single groupBy counts every facet simultaneously. Facet values
        are rendered as strings (null -> NULL row). Cost: the match
        scan + one join + one shuffle of |matches| x |cols| small rows,
        independent of how many facets are requested.
        """
        if not cols:
            raise ValueError("facets needs at least one column")
        if len(set(cols)) != len(cols):
            raise ValueError(f"duplicate facet columns: {cols}")
        if "doc_id" in cols:
            raise ValueError("doc_id is the join key, not a facet column")
        missing = [c for c in cols if c not in meta.columns]
        if missing:
            raise ValueError(f"facet columns not in meta: {missing}")
        docs = self.compile(query).docs
        joined = docs.join(meta.select("doc_id", *cols), "doc_id")
        kv = F.explode(
            F.create_map(
                *[
                    x
                    for c in cols
                    for x in (F.lit(c), F.col(c).cast("string"))
                ]
            )
        )
        return (
            joined.select(kv.alias("facet", "value"))
            .groupBy("facet", "value")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    def facet_stats(
        self,
        query: Query,
        meta: DataFrame,
        group_col: str,
        value_col: str,
    ) -> DataFrame:
        """Numeric stats per facet bucket over a query's match set
        (Elasticsearch stats-aggregation analog): for each value of
        ``group_col`` among matching docs, the count / min / max / sum /
        avg of ``value_col`` -> (group, n_docs, min_v, max_v, sum_v,
        avg_v), group asc.

        Same envelope as :meth:`facets`: membership-only docs branch
        (positions never decoded) joined to meta, ONE partial-agg
        groupBy — all five statistics are algebraic, so the map-side
        combine does most of the work and the shuffle carries one row
        per (partition, group).
        """
        for c in (group_col, value_col):
            if c not in meta.columns:
                raise ValueError(f"column not in meta: {c}")
        docs = self.compile(query).docs
        joined = docs.join(
            meta.select("doc_id", group_col, value_col), "doc_id"
        )
        v = F.col(value_col).cast("double")
        return (
            joined.groupBy(F.col(group_col).alias("group"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min(v).alias("min_v"),
                F.max(v).alias("max_v"),
                F.sum(v).alias("sum_v"),
                F.avg(v).alias("avg_v"),
            )
            .orderBy("group")
        )

    def highlight(
        self, results: DataFrame, before: str, after: str
    ) -> DataFrame:
        """Attach highlighted content (search_result.rs:54-66)."""
        if self.index.docs is None:
            raise ValueError(
                "index has no document table (built with store_docs=False "
                "and loaded without docs=...); pass the corpus DataFrame "
                "to load_index to enable highlighting"
            )
        return (
            results.join(self.index.docs.select("doc_id", "text"), "doc_id")
            .withColumn(
                "highlighted",
                byte_slice_highlight(
                    F.col("text"),
                    F.col("positions"),
                    F.lit(before),
                    F.lit(after),
                ),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def _expansion_terms(self, q: Query, max_expansions: int) -> List[str]:
        """Flatten a term-bag query (Match / Fuzzy / Wildcard / Regex /
        Prefix / Or of those) to its exact dictionary terms, each leaf
        capped at
        ``max_expansions`` by (df_full desc, term asc). Driver-side —
        the expansion is at most a few hundred strings by construction."""
        if isinstance(q, Match):
            out: List[str] = []
            for tok in analyze_query(q.text):
                if tok.term not in out:
                    out.append(tok.term)
            return out
        if isinstance(q, Or):
            out = []
            for c in q.children:
                for t in self._expansion_terms(c, max_expansions):
                    if t not in out:
                        out.append(t)
            return out
        td = self.index.termdict
        if isinstance(q, Fuzzy):
            if self.index.ngrams:
                raise ValueError("Fuzzy requires a full-token index")
            terms = [t.term for t in analyze_query(q.text)]
            if len(terms) != 1:
                raise ValueError(
                    f"Fuzzy wants exactly one analyzed term, got {terms!r}"
                )
            t = terms[0]
            cand = td.filter(
                F.length("term").between(
                    len(t) - q.max_edits, len(t) + q.max_edits
                )
            ).filter(F.levenshtein(F.col("term"), F.lit(t)) <= q.max_edits)
            cap = min(q.max_expansions, max_expansions)
        elif isinstance(q, Wildcard):
            if not q.pattern:
                return []
            pre = wildcard_literal_prefix(q.pattern)
            cand = td.filter(
                F.col("term").rlike("^" + wildcard_regex(q.pattern) + "$")
            )
            if pre:
                cand = cand.filter(F.col("term") >= pre)
                hi = prefix_upper_bound(pre)
                if hi is not None:
                    cand = cand.filter(F.col("term") < hi)
            cap = max_expansions
        elif isinstance(q, Regex):
            if not q.pattern:
                return []
            pre, lit = regex_parse(q.pattern)
            if lit is not None:
                cand = td.filter(F.col("term") == lit)
            else:
                cand = td.filter(
                    F.col("term").rlike("^(?:" + q.pattern + ")$")
                )
                if pre:
                    cand = cand.filter(F.col("term") >= pre)
                    hi = prefix_upper_bound(pre)
                    if hi is not None:
                        cand = cand.filter(F.col("term") < hi)
            cap = max_expansions
        elif isinstance(q, Prefix):
            if not q.text:
                return []
            cand = td.filter(F.col("term") >= q.text)
            hi = prefix_upper_bound(q.text)
            if hi is not None:
                cand = cand.filter(F.col("term") < hi)
            cap = max_expansions
        elif isinstance(q, Phonetic):
            if self.index.ngrams:
                raise ValueError("Phonetic requires a full-token index")
            terms = [t.term for t in analyze_query(q.text)]
            if len(terms) != 1:
                raise ValueError(
                    f"Phonetic wants exactly one analyzed term, got {terms!r}"
                )
            from .oracle import soundex

            t = terms[0]
            first = t[0] if t else ""
            if ("a" <= first <= "z") or ("A" <= first <= "Z"):
                lo = first.lower()
                cand = td.filter(
                    (F.col("term") >= lo)
                    & (F.col("term") < chr(ord(lo) + 1))
                )
            else:
                cand = td.filter(F.col("term") == t)
            cand = cand.filter(F.soundex(F.col("term")) == F.lit(soundex(t)))
            cap = min(q.max_expansions, max_expansions)
        else:
            raise ValueError(
                f"bm25_query ranks term-bag queries (Match/Fuzzy/Wildcard/"
                f"Regex/Prefix/Phonetic/Or of those), not "
                f"{type(q).__name__} — use results() for "
                "positional/boolean semantics"
            )
        rows = (
            cand.orderBy(F.col("df_full").desc(), F.col("term").asc())
            .limit(cap)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def bm25_query(
        self,
        query: Query,
        k: Optional[int] = 10,
        max_expansions: int = 128,
        filter_docs: Optional[DataFrame] = None,
        doc_range: Optional[tuple] = None,
    ) -> DataFrame:
        """BM25 ranking for dictionary-expansion queries — fuzzy,
        wildcard and prefix SEARCH, not just matching (the Lucene
        multi-term-query rewrite): expand each leaf to its exact
        dictionary terms driver-side (per-leaf cap ``max_expansions``,
        highest-df first), then score the flat term bag with the normal
        BM25 path — every expanded term keeps its own idf, and the
        query auto-routes to block-max WAND when segments are fresh.
        """
        terms = self._expansion_terms(query, max_expansions)
        return self.bm25(
            " ".join(terms), k=k, filter_docs=filter_docs, doc_range=doc_range
        )

    def snippets(
        self,
        query: Query,
        k: int = 10,
        frag_bytes: int = 100,
        before: str = "<b>",
        after: str = "</b>",
    ) -> DataFrame:
        """Top-k result fragments -> (doc_id, score, snippet): the
        ``frag_bytes`` byte window centered on each winner's first
        matched position, in-window matches wrapped with before/after.

        Fragment extraction runs only on the k winners (the two-pass
        top-k already fetches exactly their positions), so the UDF
        touches k rows regardless of corpus size; the doc-store join is
        a broadcast of k doc ids against the sorted docs table.
        """
        if self.index.docs is None:
            raise ValueError(
                "index has no document table (built with store_docs=False "
                "and loaded without docs=...); pass the corpus DataFrame "
                "to load_index to enable snippets"
            )
        res = self.results(query, k=k, with_positions=True)
        return (
            res.join(self.index.docs.select("doc_id", "text"), "doc_id")
            .withColumn(
                "snippet",
                byte_slice_snippet(
                    F.col("text"),
                    F.col("positions"),
                    F.lit(frag_bytes),
                    F.lit(before),
                    F.lit(after),
                ),
            )
            .select("doc_id", "score", "snippet")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    # ------------------------------------------------------------------
    # production scorer: BM25 over full tokens

    def ltr_features(self, texts: List[str], k: int = 20) -> DataFrame:
        """Learning-to-rank feature logging (the ES LTR-plugin /
        feature-store shape): for each query, the top-``k`` BM25
        candidates with a per-(query, doc) feature row ready for an
        offline ranker to train on::

            (query_id, doc_id, score      -- BM25 (routed)
             n_matched,                   -- distinct query terms in doc
             tf_sum,                      -- total tf over query terms
             span,                        -- min window covering all
                                          -- terms (null: no co-occur)
             dl_tokens, dl_bytes)         -- doc length features

        Candidate generation is the production ranker (so training
        sees the serving distribution); features come from ONE
        term-pruned postings aggregation, the window-restricted
        :meth:`min_window` (positions decode for k docs per query, not
        corpus-wide), and a docstats join on the k-sized candidate
        set. Queries are a driver-side bounded list (the offline
        training-set job shape) — each adds query-sized, not
        corpus-sized, work.
        """
        if not texts:
            raise ValueError("ltr_features needs at least one query")
        out = None
        for qid, text in enumerate(texts):
            cand = self.bm25(text, k=k).select("doc_id", "score")
            terms: List[str] = []
            for tok in analyze_query(text):
                if tok.term not in terms:
                    terms.append(tok.term)
            cand_ids = cand.select("doc_id")
            tf_feats = (
                self.index.postings.filter(
                    F.col("term").isin(terms) & (F.col("tf") > 0)
                )
                .join(cand_ids, "doc_id", "left_semi")
                .groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).cast("int").alias("n_matched"),
                    F.sum("tf").cast("long").alias("tf_sum"),
                )
            )
            spans = self.min_window(text, filter_docs=cand_ids)
            row = (
                cand.join(tf_feats, "doc_id", "left")
                .join(spans, "doc_id", "left")
                .join(
                    self.index.docstats.select(
                        "doc_id",
                        F.col("doclen_tokens").cast("long").alias("dl_tokens"),
                        F.col("doclen_bytes").cast("long").alias("dl_bytes"),
                    ),
                    "doc_id",
                )
                .select(
                    F.lit(qid).cast("int").alias("query_id"),
                    "doc_id",
                    "score",
                    F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
                    F.coalesce("tf_sum", F.lit(0)).alias("tf_sum"),
                    "span",
                    "dl_tokens",
                    "dl_bytes",
                )
            )
            out = row if out is None else out.unionByName(row)
        return out.orderBy("query_id", F.desc("score"), F.asc("doc_id"))

    def bm25_batch(
        self,
        texts: List[str],
        k: int = 10,
        filter_docs: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Top-k BM25 for MANY queries in one job.

        Returns (query_id, doc_id, score, rank) with rank 1..k per
        query (score desc, doc_id asc). One postings scan covers the
        union of all query terms; per-query top-k is a window
        ``row_number() <= k`` partitioned by query_id (SURVEY §2.4
        window-functions row). At 10^5 queries/batch this amortizes the
        scan and shuffles once — the shape for offline relevance jobs.

        With fresh segments the batch routes to ``wand_topk_batch``
        (one segment pass for the whole batch, no docstats shuffle —
        doc lengths are baked into the shard files); the DataFrame plan
        below is the fallback for segment-less indexes. ``filter_docs``
        restricts candidates (global idf/avgdl, relational plan pinned —
        see :meth:`bm25`).
        """
        seg = self._segment_path() if filter_docs is None else None
        if seg is not None:
            from .wand import wand_topk_batch

            return wand_topk_batch(
                self.index.docstats.sparkSession, seg, texts, k=k
            )
        q_terms: List[tuple] = []  # (query_id, term)
        for qid, text in enumerate(texts):
            seen: List[str] = []
            for tok in analyze_query(text):
                if tok.term not in seen:
                    seen.append(tok.term)
            q_terms.extend((qid, t) for t in seen)
        if not q_terms:
            return self.index.docstats.sparkSession.createDataFrame(
                [], "query_id int, doc_id long, score double, rank int"
            )
        spark = self.index.postings.sparkSession
        qdf = spark.createDataFrame(q_terms, "query_id int, term string")
        all_terms = list({t for _, t in q_terms})
        n, avgdl = float(self.index.n_docs), float(self.index.avgdl)
        matched = self.index.postings.filter(
            F.col("term").isin(all_terms) & (F.col("tf") > 0)
        ).select("term", "doc_id", "tf")
        if filter_docs is not None:
            matched = matched.join(
                filter_docs.select("doc_id").distinct(), "doc_id", "left_semi"
            )
        df_tbl = self.index.termdict.filter(
            F.col("term").isin(all_terms)
        ).select("term", F.col("df_full").alias("df"))
        idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        per_term = (
            matched.join(F.broadcast(qdf), "term")  # fan out to queries
            .join(F.broadcast(df_tbl), "term")
            .join(self.index.docstats.select("doc_id", "doclen_tokens"), "doc_id")
            .withColumn(
                "s",
                idf
                * F.col("tf")
                * (K1 + 1.0)
                / (
                    F.col("tf")
                    + K1
                    * (1.0 - B + B * F.col("doclen_tokens") / F.lit(avgdl))
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            per_term.groupBy("query_id", "doc_id")
            .agg(F.sum("s").alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("query_id", "rank")
        )

    def bm25(
        self,
        text: str,
        k: Optional[int] = 10,
        filter_docs: Optional[DataFrame] = None,
        doc_range: Optional[tuple] = None,
        boosts: Optional[dict] = None,
    ) -> DataFrame:
        """BM25 top-k (k1=1.2, b=0.75) over full-token postings.

        idf = ln((N - df + 0.5)/(df + 0.5) + 1); dl = tokens per doc;
        all JVM-side: postings scan -> termdict join (broadcast: one row
        per query term) -> docstats join -> weighted sum -> top-k via
        TakeOrderedAndProject. Routes to block-max WAND over the
        compressed segments when they are fresh (exact, and skips
        everything the threshold proves can't rank).

        ``filter_docs`` (one doc_id column) restricts CANDIDATES to
        those docs; idf/avgdl/N stay corpus-global (the standard
        filter-query contract). ``k=None`` scores every matching doc —
        the shape downstream aggregations want (e.g.
        transcripts.conversation_topk). Both pin the relational plan:
        WAND's threshold pruning assumes an unfiltered complete top-k.

        ``doc_range=(lo, hi)`` restricts to doc ids in [lo, hi) and
        STAYS on the WAND path when segments are fresh — shards are doc
        ranges, so the window prunes whole files structurally and the
        kernel masks boundary shards exactly (time-scoped search over
        time-ordered ids at full segment speed). With a filter_docs
        frame too, both restrictions apply on the relational path.
        """
        seg = (
            self._segment_path()
            if filter_docs is None and k is not None
            else None
        )
        if seg is not None:
            from .wand import wand_topk

            return wand_topk(
                self.index.docstats.sparkSession, seg, text, k=k,
                doc_range=doc_range, boosts=boosts,
            )
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        if boosts:
            # ONE shared contract with the WAND route: invalid rejected,
            # zero DROPS the term entirely (a 0-weight term must not
            # keep its otherwise-unmatched docs in the result set)
            from .wand import _apply_boosts

            terms = list(_apply_boosts({t: 1.0 for t in terms}, boosts))
        if not terms:
            return (
                self.index.docstats.select("doc_id")
                .withColumn("score", F.lit(0.0))
                .filter(F.lit(False))
            )
        n, avgdl = float(self.index.n_docs), float(self.index.avgdl)
        matched = self.index.postings.filter(
            F.col("term").isin(terms) & (F.col("tf") > 0)
        ).select("term", "doc_id", "tf")
        if doc_range is not None:
            # sargable range predicate — pushed to the postings scan
            matched = matched.filter(
                (F.col("doc_id") >= int(doc_range[0]))
                & (F.col("doc_id") < int(doc_range[1]))
            )
        if filter_docs is not None:
            matched = matched.join(
                filter_docs.select("doc_id").distinct(), "doc_id", "left_semi"
            )
        df_tbl = (
            self.index.termdict.filter(F.col("term").isin(terms))
            .select("term", F.col("df_full").alias("df"))
        )
        idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        if boosts:
            # the map covers every surviving term, so the lookup
            # cannot miss (rows are filtered to these terms)
            boost_col = F.create_map(
                *[
                    x
                    for t in terms
                    for x in (
                        F.lit(t),
                        F.lit(float(boosts.get(t, 1.0))),
                    )
                ]
            )[F.col("term")]
            idf = idf * boost_col
        per_term = (
            matched.join(F.broadcast(df_tbl), "term")
            .join(self.index.docstats.select("doc_id", "doclen_tokens"), "doc_id")
            .withColumn(
                "s",
                idf
                * F.col("tf")
                * (K1 + 1.0)
                / (
                    F.col("tf")
                    + K1
                    * (1.0 - B + B * F.col("doclen_tokens") / F.lit(avgdl))
                ),
            )
        )
        scored = (
            per_term.groupBy("doc_id")
            .agg(F.sum("s").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return scored.limit(k) if k is not None else scored

    def score_topk(
        self,
        text: str,
        k: Optional[int] = 10,
        similarity: str = "bm25",
        mu: float = 2000.0,
        filter_docs: Optional[DataFrame] = None,
        doc_range: Optional[tuple] = None,
    ) -> DataFrame:
        """Ranked retrieval with a pluggable similarity (engine
        extension — the reference scores only its parity width/√bytes,
        search_result.rs:21-24; this is the Lucene-style pluggable-
        Similarity surface).

        ``similarity``:

        - ``"bm25"`` — delegates to :meth:`bm25` (k1=1.2, b=0.75;
          WAND-routed when segments are fresh).
        - ``"lmd"`` — language model with Dirichlet smoothing (Zhai &
          Lafferty 2001; Lucene LMDirichletSimilarity shape), summed
          over matched query terms:
          ``ln(1 + tf/(mu*p(t|C))) + ln(mu/(dl+mu))`` with
          ``p(t|C) = cf_t / total_tokens`` (collection frequency over
          the full corpus). No per-term zero-clamp: scores may be
          negative; ordering is (score desc, doc_id asc).
        - ``"tfidf"`` — Lucene ClassicSimilarity shape:
          ``sqrt(tf) * (1 + ln(N/(df+1)))^2 / sqrt(dl)`` summed over
          matched terms (queryNorm/coord omitted, as modern Lucene
          does).

        All similarities share the same physical plan as the
        relational BM25 path: term-pruned postings scan (sargable
        ``doc_range``), broadcast per-term stats (|terms| rows),
        docstats join, partial-agg sum, TakeOrdered top-k — no
        corpus-wide shuffle at any scale.
        """
        if similarity == "bm25":
            return self.bm25(
                text, k=k, filter_docs=filter_docs, doc_range=doc_range
            )
        if similarity not in ("lmd", "tfidf"):
            raise ValueError(
                f"unknown similarity {similarity!r}; "
                "expected 'bm25', 'lmd' or 'tfidf'"
            )
        if similarity == "lmd" and mu <= 0:
            raise ValueError(f"mu must be positive, got {mu}")
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        if not terms:
            return (
                self.index.docstats.select("doc_id")
                .withColumn("score", F.lit(0.0))
                .filter(F.lit(False))
            )
        matched = self.index.postings.filter(
            F.col("term").isin(terms) & (F.col("tf") > 0)
        ).select("term", "doc_id", "tf")
        if doc_range is not None:
            matched = matched.filter(
                (F.col("doc_id") >= int(doc_range[0]))
                & (F.col("doc_id") < int(doc_range[1]))
            )
        if filter_docs is not None:
            matched = matched.join(
                filter_docs.select("doc_id").distinct(), "doc_id", "left_semi"
            )
        dl = F.col("doclen_tokens")
        if similarity == "lmd":
            # per-term collection frequency (|terms| rows, broadcast) +
            # corpus token total — a per-index constant, so the one
            # corpus-wide aggregate runs once per engine, not per query
            total_tokens = getattr(self, "_lmd_total_tokens", None)
            if total_tokens is None:
                total_tokens = float(
                    self.index.docstats.agg(
                        F.sum("doclen_tokens").alias("t")
                    ).first()["t"]
                )
                self._lmd_total_tokens = total_tokens
            stats_tbl = (
                self.index.postings.filter(F.col("term").isin(terms))
                .groupBy("term")
                .agg(F.sum("tf").alias("cf"))
            )
            p_t = F.col("cf") / F.lit(total_tokens)
            s = F.log(1.0 + F.col("tf") / (F.lit(float(mu)) * p_t)) + F.log(
                F.lit(float(mu)) / (dl + F.lit(float(mu)))
            )
        else:  # tfidf
            n = float(self.index.n_docs)
            stats_tbl = (
                self.index.termdict.filter(F.col("term").isin(terms))
                .select("term", F.col("df_full").alias("df"))
            )
            idf = 1.0 + F.log(F.lit(n) / (F.col("df") + 1.0))
            s = F.sqrt(F.col("tf")) * idf * idf / F.sqrt(dl)
        per_term = (
            matched.join(F.broadcast(stats_tbl), "term")
            .join(
                self.index.docstats.select("doc_id", "doclen_tokens"),
                "doc_id",
            )
            .withColumn("s", s)
        )
        scored = (
            per_term.groupBy("doc_id")
            .agg(F.sum("s").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return scored.limit(k) if k is not None else scored

    def hybrid(
        self,
        text: str,
        embeddings: DataFrame,
        query_vec,
        k: int = 10,
        n_each: int = 20,
        k_rrf: int = 60,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Hybrid lexical+vector search: fuse this engine's BM25
        top-``n_each`` with a cosine top-``n_each`` over ``embeddings``
        by reciprocal-rank fusion (see :mod:`.hybrid`). Engine
        extension — the reference has no vector side. Returns
        ``(doc_id, lex_rank, vec_rank, rrf)`` ordered by
        (rrf desc, doc_id asc), limited to ``k``."""
        from .hybrid import hybrid_topk

        return hybrid_topk(
            self,
            embeddings,
            text,
            query_vec,
            k=k,
            n_each=n_each,
            k_rrf=k_rrf,
            id_col=id_col,
            vec_col=vec_col,
        )
