"""Query AST — the user-facing query algebra.

Mirrors the reference's recursive ``Query`` enum
(/root/reference/src/query.rs:5-27): Match | And | Or | Phrase | Prefix.
Shared by the pure-Python oracle and the Spark compiler, with no heavy
imports so either side can load it standalone.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass
from typing import Tuple


def wildcard_regex(pattern: str) -> str:
    """Unanchored regex body for a Wildcard pattern: ``*`` -> ``.*``,
    ``?`` -> ``.``, everything else escaped. Uses only the regex subset
    on which Java (Spark ``rlike``), RE2 (DuckDB) and Python ``re``
    agree exactly — callers anchor it (``^...$`` / fullmatch)."""
    return "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in pattern
    )


def wildcard_literal_prefix(pattern: str) -> str:
    """Literal chars before the first wildcard — the sargable range."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern

__all__ = [
    "Query", "Match", "And", "Or", "Phrase", "Prefix", "AndNot",
    "Near", "Fuzzy", "Wildcard", "AtLeast",
]


@dataclass(frozen=True)
class Query:
    """Base query node."""


@dataclass(frozen=True)
class Match(Query):
    """Lowercase-tokenized term lookup; over an edge-ngram index this
    matches any document containing a token the query term is a prefix
    of (reference index.rs:76-86)."""

    text: str


@dataclass(frozen=True)
class And(Query):
    """Docs present in every child; positions union-merged."""

    children: Tuple[Query, ...]

    def __init__(self, *children: Query):
        object.__setattr__(self, "children", tuple(children))


@dataclass(frozen=True)
class Or(Query):
    """Union of children; positions union-merged."""

    children: Tuple[Query, ...]

    def __init__(self, *children: Query):
        object.__setattr__(self, "children", tuple(children))


@dataclass(frozen=True)
class Phrase(Query):
    """Adjacent-pair positional match (documented false positives;
    single-token phrase is empty — reference index.rs:88-107)."""

    text: str


@dataclass(frozen=True)
class AndNot(Query):
    """Docs matching ``positive`` minus docs matching ``negative``;
    positions/score come from ``positive`` alone.

    Engine EXTENSION — the reference's algebra has no negation
    (query.rs:5-27 is Match|And|Or|Phrase|Prefix); boolean search users
    expect MUST_NOT, and a bounded difference (negation only ever
    subtracts from a positive match set) keeps it computable without a
    corpus scan. String form: ``a AND NOT b``."""

    positive: Query
    negative: Query


@dataclass(frozen=True)
class Near(Query):
    """Ordered proximity match: every consecutive analyzed-term pair
    (t_i, t_{i+1}) must co-occur in the doc with
    ``1 <= pos(t_{i+1}) - pos(t_i) <= slop``.

    Engine EXTENSION (the reference's algebra stops at exact-adjacency
    Phrase, query.rs:5-27). ``Near(text, slop=1)`` is STRICTER than
    ``Phrase(text)``: Phrase keeps docs containing both terms of a pair
    even with zero adjacencies (scored 0, postings.rs:101-112); Near
    keeps only docs with a real windowed hit for every pair. Positions
    are the pair endpoints that participate in >= 1 hit, union-merged.
    Fewer than two analyzed terms -> empty. String form: ``"a b"~3``.
    """

    text: str
    slop: int = 2


@dataclass(frozen=True)
class Fuzzy(Query):
    """Edit-distance term match: the analyzed query term expands to
    every distinct indexed FULL TOKEN within Levenshtein distance
    ``max_edits``, capped at the ``max_expansions`` highest-df tokens
    (df desc, term asc — Lucene FuzzyQuery's maxExpansions contract);
    the result is the union of their exact-token matches.

    Engine EXTENSION (no fuzzy matching in the reference). Supported on
    full-token indexes only: an edge-ngram dictionary stores prefixes,
    where edit distance over entries is meaningless. Multi-token text
    is an error — one term per node (compose with And/Or). String
    form: ``word~`` (1 edit) / ``word~2``.
    """

    text: str
    max_edits: int = 1
    max_expansions: int = 50


@dataclass(frozen=True)
class Wildcard(Query):
    """Raw (un-analyzed) dictionary wildcard match: ``?`` = exactly one
    character, ``*`` = any run (including empty), every other character
    literal — matched against WHOLE dictionary terms, like ``Prefix``'s
    raw range-scan semantics with a residual pattern.

    Engine EXTENSION (Lucene WildcardQuery analog; the reference's only
    dictionary operator is Prefix, query.rs:23-25). The pattern's
    literal prefix (chars before the first wildcard) prunes as a
    sargable term range; the residual match uses only the
    dialect-stable regex subset (escaped literals, ``.``, ``.*``) so
    the JVM, RE2 and Python evaluators agree exactly. A leading
    wildcard therefore scans the whole dictionary — legal, but O(vocab).
    Empty pattern -> empty result (mirrors Prefix).
    """

    pattern: str


@dataclass(frozen=True)
class Prefix(Query):
    """Raw (un-analyzed) term-dictionary range scan
    (reference index.rs:109-129)."""

    text: str


@dataclass(frozen=True)
class AtLeast(Query):
    """Minimum-should-match disjunction: docs matching at least ``m``
    of the children; positions are the union-merge of the rows of every
    matched child (exactly the positions ``Or`` would report for those
    children on that doc).

    Engine EXTENSION (Lucene ``BooleanQuery.minimumNumberShouldMatch``
    analog; the reference's algebra, query.rs:5-27, has only the m=1
    Or and the m=n And). ``AtLeast(1, ...)`` == ``Or(...)`` and
    ``AtLeast(n, ...)`` == ``And(...)`` — pinned by tests. ``m < 1``
    is an error; ``m > len(children)`` is the empty result. No string
    form (query-string grammar stays the reference's boolean algebra);
    construct it via the AST.
    """

    m: int
    children: Tuple[Query, ...]

    def __init__(self, m: int, *children: Query):
        if int(m) < 1:
            raise ValueError(f"AtLeast m must be >= 1, got {m}")
        object.__setattr__(self, "m", int(m))
        object.__setattr__(self, "children", tuple(children))
