"""Pure-Python oracle: single-process reference-semantics engine.

A from-scratch Python implementation of the semantics surveyed from
``/root/reference`` (SURVEY.md §2), used by the test-suite as the ground
truth the distributed Spark engine must match doc-for-doc and
position-for-position. It is trusted because every reference unit test
(``/root/reference/src/index.rs:159-407``) is ported against it in
``tests/test_oracle.py``.

Semantics pinned here (cites into the reference):

* position coalescing: two positions merge iff same token ordinal AND
  byte ranges overlap or touch (postings.rs:7-15, util/coalesce.rs:122-136);
  merging is *neighbor-only* in (begin, end, pos) sort order
  (util/coalesce.rs:32-73 checks only adjacent vector slots).
* Match: lowercase-tokenize the query (no ngrams), dedupe terms, exact
  dictionary lookup, union-merge postings (index.rs:76-86).
* And: docs present in every branch; positions = union-merge across
  branches (postings.rs:31-49). And([]) -> empty; And([q]) -> q.
* Or: union-merge of all branches (index.rs:138-142).
* Phrase: adjacent-pair positional intersection with documented false
  positives; single-token phrase -> empty; docs containing both terms of
  every pair are kept even when no adjacency exists (empty positions,
  score 0) — postings.rs:101-112 maps every doc in the doc-id
  intersection, including to an empty position list (index.rs:88-107).
* Prefix: raw (un-analyzed) term-dictionary range scan
  [prefix, prefix[:-1]+succ(last_char)) (index.rs:109-129); empty prefix
  -> empty.
* parity score: sum of coalesced byte widths / sqrt(doc byte length),
  computed in float32 (search_result.rs:19-28); order: score desc,
  doc_id asc (stable sort over ascending doc ids, index.rs:148-156).
* BM25 (production extension, per BASELINE.md): over full tokens,
  k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1), dl = tokens in doc.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .analysis import analyze_index, analyze_query

# A position is (begin, end, pos) — byte range + token ordinal.
Position = Tuple[int, int, int]
# doc_id -> sorted coalesced positions
PostingsMap = Dict[int, List[Position]]

K1 = 1.2
B = 0.75


# ---------------------------------------------------------------------------
# position coalescing


def merge_positions(a: Position, b: Position) -> Optional[Position]:
    """Merge b into a iff same ordinal and ranges overlap/touch.

    Requires a <= b in (begin, end, pos) order. Mirrors postings.rs:7-15
    + the tuple merge rule util/coalesce.rs:122-136.
    """
    if a[2] != b[2]:
        return None
    if a[1] >= b[0]:
        return (a[0], max(a[1], b[1]), a[2])
    return None


def coalesce_sorted(positions: List[Position]) -> List[Position]:
    """Sort and neighbor-merge a position list.

    Equivalent to the reference's ordered insertion with neighbor-only
    coalescing (util/coalesce.rs:32-73): after sorting by
    (begin, end, pos), an element merges only with its immediate
    predecessor in sort order.
    """
    if not positions:
        return []
    positions = sorted(set(positions))
    out = [positions[0]]
    for p in positions[1:]:
        merged = merge_positions(out[-1], p)
        if merged is not None:
            out[-1] = merged
        else:
            out.append(p)
    return out


def union_postings(maps: Sequence[PostingsMap]) -> PostingsMap:
    """Union-merge postings maps (MergeCoalesceMap, util/coalesce.rs:78-120)."""
    out: Dict[int, List[Position]] = {}
    for m in maps:
        for doc_id, positions in m.items():
            out.setdefault(doc_id, []).extend(positions)
    return {doc_id: coalesce_sorted(ps) for doc_id, ps in out.items()}


def intersect_postings(maps: Sequence[PostingsMap]) -> PostingsMap:
    """Docs in every map; positions union-merged (postings.rs:31-49)."""
    if not maps:
        return {}
    if len(maps) == 1:
        return {d: list(ps) for d, ps in maps[0].items()}
    common = set(maps[0])
    for m in maps[1:]:
        common &= set(m)
    out: PostingsMap = {}
    for doc_id in common:
        acc: List[Position] = []
        for m in maps:
            acc.extend(m[doc_id])
        out[doc_id] = coalesce_sorted(acc)
    return out


def intersect_positionally(
    left: List[Position], right: List[Position]
) -> List[Position]:
    """Adjacency intersection: keep (l, r) pairs with l.pos + 1 == r.pos.

    Exact transcription of the two-pointer walk semantics in
    postings.rs:66-99 including its dedup-only-against-last behavior.
    """
    out: List[Position] = []
    li, ri = 0, 0
    while li < len(left) and ri < len(right):
        l, r = left[li], right[ri]
        if l[2] < r[2]:
            if l[2] + 1 == r[2]:
                if not out or out[-1] != l:
                    out.append(l)
                out.append(r)
                ri += 1
            li += 1
        else:
            ri += 1
    return out


# ---------------------------------------------------------------------------
# query AST (shared with the Spark compiler; mirrors reference query.rs:5-27)

from .qast import (  # noqa: E402,F401
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
    wildcard_regex,
)


def levenshtein(a: str, b: str) -> int:
    """Plain O(len(a)*len(b)) edit distance (insert/delete/substitute,
    unit costs) over CODE POINTS — the semantics of Spark's
    ``F.levenshtein`` (verified incl. astral-plane chars, which Java
    counts as one code point, not two UTF-16 units), so the relational
    Fuzzy path and this oracle always agree. DuckDB's ``levenshtein``
    is BYTE-based and diverges on any non-ASCII input ('İ' counts as 2,
    '𝒜' as 4) — DuckDB-oracled Fuzzy contracts must therefore use
    ASCII vocabularies (the sf testdata corpus is ASCII); parity on
    non-ASCII terms is pinned engine-vs-this-oracle instead
    (tests/test_near_fuzzy.py)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_SOUNDEX_CODE = {
    **{c: "1" for c in "BFPV"},
    **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"},
    "L": "4",
    "M": "5",
    "N": "5",
    "R": "6",
}


def soundex(s: str) -> str:
    """Classic American Soundex with the H/W rule, matching Spark's
    ``F.soundex`` exactly (parity pinned over the corpus vocabulary
    plus randomized strings in tests/test_phonetic.py):

    - non-[A-Za-z] FIRST char -> the input is returned unchanged
      (Spark: soundex('1abc') = '1abc', soundex('über') = 'über',
      soundex('ßuber') = 'ßuber' — the check is on the RAW char, so a
      char that only full-Unicode-uppercases into A-Z ('ß' -> 'SS',
      'ſ' -> 'S') still disqualifies; Java maps chars one-by-one);
    - H and W are transparent — they neither emit nor reset, so
      letters of equal code across them collapse ('bhb' -> B000);
    - vowels, Y and any non-[A-Za-z] char reset the adjacency ('bab',
      'b1b', "b'b", 'bßb', 'bſb' all -> B100 — mid-string non-ASCII
      letters are separators, never coded);
    - output is the uppercased first letter + up to three digits,
      zero-padded to 4.
    """
    if not s:
        return s
    first = s[0]
    if "a" <= first <= "z":
        first = first.upper()
    if not ("A" <= first <= "Z"):
        return s
    out = first
    prev = _SOUNDEX_CODE.get(first)
    for ch in s[1:]:
        c = ch.upper() if "a" <= ch <= "z" else ch
        if "A" <= c <= "Z":
            if c in "HW":
                continue
            code = _SOUNDEX_CODE.get(c)
            if code is None:
                prev = None
            else:
                if code != prev:
                    out += code
                    if len(out) == 4:
                        break
                prev = code
        else:
            prev = None
    return out.ljust(4, "0")


# ---------------------------------------------------------------------------
# result + highlight


@dataclass
class SearchResult:
    doc_id: int
    positions: List[Position]
    score: float


def highlight(text: str, positions: Sequence[Position], before: str, after: str) -> str:
    """Wrap each position's byte range with before/after markers.

    Byte-range slicing of the UTF-8 encoding (search_result.rs:54-66);
    positions are sorted and non-overlapping by construction.
    """
    raw = text.encode("utf-8")
    bb, ba = before.encode("utf-8"), after.encode("utf-8")
    parts = bytearray()
    cursor = 0
    for begin, end, _pos in positions:
        parts += raw[cursor:begin] + bb + raw[begin:end] + ba
        cursor = end
    parts += raw[cursor:]
    return parts.decode("utf-8")


def parity_score(positions: Sequence[Position], doclen_bytes: int) -> float:
    """Reference score: sum matched widths / sqrt(doc bytes), in float32."""
    width = np.float32(sum(e - b for b, e, _ in positions))
    return float(width / np.sqrt(np.float32(doclen_bytes)))


def prefix_upper_bound(prefix: str) -> Optional[str]:
    """Exclusive upper bound of the term range for a prefix scan.

    prefix[:-1] + successor(last char), skipping the surrogate block
    (util/successor.rs:9-24); None = unbounded (last char is U+10FFFF).
    """
    last = ord(prefix[-1])
    if last == 0xD7FF:
        nxt = 0xE000
    elif last == 0x10FFFF:
        return None
    else:
        nxt = last + 1
    return prefix[:-1] + chr(nxt)


# ---------------------------------------------------------------------------
# the oracle engine


@dataclass
class OracleIndex:
    """In-memory inverted index with reference semantics (index.rs:15-20)."""

    index: Dict[str, PostingsMap] = field(default_factory=dict)
    docs: Dict[int, str] = field(default_factory=dict)

    # -- write path (index.rs:35-63) --

    def add(self, doc_id: int, content: str) -> None:
        prev = self.docs.get(doc_id)
        if prev is not None:
            for tok in analyze_index(prev):
                pm = self.index.get(tok.term)
                if pm is not None:
                    pm.pop(doc_id, None)
                    if not pm:
                        del self.index[tok.term]
        self.docs[doc_id] = content
        touched = set()
        for tok in analyze_index(content):
            plist = self.index.setdefault(tok.term, {}).setdefault(doc_id, [])
            plist.append((tok.begin, tok.end, tok.pos))
            touched.add(tok.term)
        # normalize: sorted + coalesced per (term, doc) — one analyzer
        # pass total (the analysis dominates add(); percolation builds
        # an index per document, so the constant factor is load-bearing)
        for t in touched:
            pm = self.index[t]
            pm[doc_id] = coalesce_sorted(pm[doc_id])

    # -- read path --

    def _match(self, text: str) -> PostingsMap:
        seen = []
        for tok in analyze_query(text):
            if tok.term not in seen:
                seen.append(tok.term)
        maps = [self.index[t] for t in seen if t in self.index]
        return union_postings(maps)

    def _phrase(self, text: str) -> PostingsMap:
        terms = [t.term for t in analyze_query(text)]
        if len(terms) < 2:
            return {}
        pair_maps: List[PostingsMap] = []
        for t0, t1 in zip(terms, terms[1:]):
            m0, m1 = self.index.get(t0), self.index.get(t1)
            if m0 is None or m1 is None:
                pair_maps.append({})
                continue
            pair: PostingsMap = {}
            for doc_id in set(m0) & set(m1):
                pair[doc_id] = intersect_positionally(m0[doc_id], m1[doc_id])
            pair_maps.append(pair)
        return intersect_postings(pair_maps)

    def _near(self, text: str, slop: int) -> PostingsMap:
        """Ordered windowed proximity (qast.Near): per consecutive term
        pair keep docs with >= 1 (l, r) where 1 <= r.pos - l.pos <= slop;
        positions are the participating endpoints. Unlike Phrase there
        is no zero-hit membership — intersect_postings over hit-only
        pair maps enforces a real hit for EVERY pair."""
        terms = [t.term for t in analyze_query(text)]
        if len(terms) < 2:
            return {}
        pair_maps: List[PostingsMap] = []
        for t0, t1 in zip(terms, terms[1:]):
            m0, m1 = self.index.get(t0), self.index.get(t1)
            if m0 is None or m1 is None:
                pair_maps.append({})
                continue
            pair: PostingsMap = {}
            for doc_id in set(m0) & set(m1):
                hits = set()
                for l in m0[doc_id]:
                    for r in m1[doc_id]:
                        if 1 <= r[2] - l[2] <= slop:
                            hits.add(l)
                            hits.add(r)
                if hits:
                    pair[doc_id] = coalesce_sorted(sorted(hits))
            pair_maps.append(pair)
        return intersect_postings(pair_maps)

    def _fuzzy(self, text: str, max_edits: int, max_expansions: int) -> PostingsMap:
        """Edit-distance expansion over distinct FULL tokens (qast.Fuzzy):
        candidates within ``max_edits`` of the single analyzed query
        term, capped at the ``max_expansions`` highest-df tokens
        (df desc, term asc), each matched exactly; union-merged."""
        terms = [t.term for t in analyze_query(text)]
        if len(terms) != 1:
            raise ValueError(
                f"Fuzzy wants exactly one analyzed term, got {terms!r}"
            )
        q = terms[0]
        full: Dict[str, PostingsMap] = {}
        for doc_id, content in self.docs.items():
            for tok in analyze_index(content, ngrams=False):
                full.setdefault(tok.term, {}).setdefault(doc_id, []).append(
                    (tok.begin, tok.end, tok.pos)
                )
        cand = [
            t
            for t in full
            if abs(len(t) - len(q)) <= max_edits
            and levenshtein(t, q) <= max_edits
        ]
        cand.sort(key=lambda t: (-len(full[t]), t))
        cand = cand[:max_expansions]
        return union_postings(
            [
                {d: coalesce_sorted(sorted(ps)) for d, ps in full[t].items()}
                for t in cand
            ]
        )

    def _phonetic(self, text: str, max_expansions: int) -> PostingsMap:
        """Soundex expansion over distinct FULL tokens (qast.Phonetic):
        candidates with the query term's soundex code, capped at the
        ``max_expansions`` highest-df tokens (df desc, term asc), each
        matched exactly; union-merged."""
        terms = [t.term for t in analyze_query(text)]
        if len(terms) != 1:
            raise ValueError(
                f"Phonetic wants exactly one analyzed term, got {terms!r}"
            )
        q = terms[0]
        code = soundex(q)
        full: Dict[str, PostingsMap] = {}
        for doc_id, content in self.docs.items():
            for tok in analyze_index(content, ngrams=False):
                full.setdefault(tok.term, {}).setdefault(doc_id, []).append(
                    (tok.begin, tok.end, tok.pos)
                )
        cand = [t for t in full if soundex(t) == code]
        cand.sort(key=lambda t: (-len(full[t]), t))
        cand = cand[:max_expansions]
        return union_postings(
            [
                {d: coalesce_sorted(sorted(ps)) for d, ps in full[t].items()}
                for t in cand
            ]
        )

    def _prefix(self, prefix: str) -> PostingsMap:
        if not prefix:
            return {}
        hi = prefix_upper_bound(prefix)
        maps = [
            pm
            for term, pm in self.index.items()
            if term >= prefix and (hi is None or term < hi)
        ]
        return union_postings(maps)

    def _wildcard(self, pattern: str) -> PostingsMap:
        """Raw dictionary wildcard (qast.Wildcard): whole-term match of
        the translated pattern; empty pattern -> empty (like Prefix)."""
        if not pattern:
            return {}
        import re

        rx = re.compile(wildcard_regex(pattern))
        maps = [
            pm
            for term, pm in self.index.items()
            if rx.fullmatch(term) is not None
        ]
        return union_postings(maps)

    def _regex(self, pattern: str) -> PostingsMap:
        """Raw dictionary regex (qast.Regex): whole-term fullmatch of
        the dialect-stable validated pattern; empty pattern -> empty
        (like Prefix/Wildcard)."""
        if not pattern:
            return {}
        regex_parse(pattern)  # same rejection surface as the engine
        import re

        rx = re.compile(pattern)
        maps = [
            pm
            for term, pm in self.index.items()
            if rx.fullmatch(term) is not None
        ]
        return union_postings(maps)

    def postings_for(self, query: Query) -> PostingsMap:
        if isinstance(query, Match):
            return self._match(query.text)
        if isinstance(query, And):
            return intersect_postings([self.postings_for(q) for q in query.children])
        if isinstance(query, Or):
            return union_postings([self.postings_for(q) for q in query.children])
        if isinstance(query, Phrase):
            return self._phrase(query.text)
        if isinstance(query, Prefix):
            return self._prefix(query.text)
        if isinstance(query, Wildcard):
            return self._wildcard(query.pattern)
        if isinstance(query, Regex):
            return self._regex(query.pattern)
        if isinstance(query, Near):
            return self._near(query.text, query.slop)
        if isinstance(query, Fuzzy):
            return self._fuzzy(query.text, query.max_edits, query.max_expansions)
        if isinstance(query, Phonetic):
            return self._phonetic(query.text, query.max_expansions)
        if isinstance(query, AndNot):
            pos = self.postings_for(query.positive)
            neg = self.postings_for(query.negative)
            return {d: list(ps) for d, ps in pos.items() if d not in neg}
        if isinstance(query, AtLeast):
            maps = [self.postings_for(c) for c in query.children]
            if query.m > len(maps):
                return {}
            # docs in >= m children; positions = union-merge of the rows
            # of every matched child (qast.AtLeast)
            counts: Dict[int, int] = {}
            for m in maps:
                for d in m:
                    counts[d] = counts.get(d, 0) + 1
            keep = {d for d, c in counts.items() if c >= query.m}
            return union_postings(
                [{d: ps for d, ps in m.items() if d in keep} for m in maps]
            )
        raise TypeError(f"unknown query node: {query!r}")

    def query(self, query: Query) -> List[SearchResult]:
        postings = self.postings_for(query)
        results = [
            SearchResult(
                doc_id,
                positions,
                parity_score(positions, len(self.docs[doc_id].encode("utf-8"))),
            )
            for doc_id, positions in sorted(postings.items())
        ]
        results.sort(key=lambda r: (-r.score, r.doc_id))
        return results

    def search(self, text: str) -> List[SearchResult]:
        return self.query(Match(text))

    def highlight(self, result: SearchResult, before: str, after: str) -> str:
        return highlight(self.docs[result.doc_id], result.positions, before, after)

    # -- BM25 (production extension) --

    def bm25(self, text: str, k: int = 10) -> List[Tuple[int, float]]:
        """BM25 top-k over full (non-ngram) tokens; ground truth for the
        Spark engine's production scorer. Query analyzed like Match."""
        tokens: Dict[int, List[str]] = {
            d: [t.term for t in analyze_index(c, ngrams=False)]
            for d, c in self.docs.items()
        }
        n_docs = len(tokens)
        avgdl = (
            sum(len(ts) for ts in tokens.values()) / n_docs if n_docs else 0.0
        )
        terms = []
        for t in analyze_query(text):
            if t.term not in terms:
                terms.append(t.term)
        scores: Dict[int, float] = {}
        for term in terms:
            df = sum(1 for ts in tokens.values() if term in ts)
            if df == 0:
                continue
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            for doc_id, ts in tokens.items():
                tf = ts.count(term)
                if tf == 0:
                    continue
                dl = len(ts)
                denom = tf + K1 * (1.0 - B + B * dl / avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (K1 + 1.0) / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
