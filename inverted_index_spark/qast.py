"""Query AST — the user-facing query algebra.

Mirrors the reference's recursive ``Query`` enum
(/root/reference/src/query.rs:5-27): Match | And | Or | Phrase | Prefix.
Shared by the pure-Python oracle and the Spark compiler, with no heavy
imports so either side can load it standalone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

__all__ = ["Query", "Match", "And", "Or", "Phrase", "Prefix", "AndNot"]


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
class Prefix(Query):
    """Raw (un-analyzed) term-dictionary range scan
    (reference index.rs:109-129)."""

    text: str
