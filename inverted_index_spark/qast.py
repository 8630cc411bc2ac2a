"""Query AST — the user-facing query algebra.

Mirrors the reference's recursive ``Query`` enum
(/root/reference/src/query.rs:5-27): Match | And | Or | Phrase | Prefix.
Shared by the pure-Python oracle and the Spark compiler, with no heavy
imports so either side can load it standalone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

__all__ = ["Query", "Match", "And", "Or", "Phrase", "Prefix"]


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
class Prefix(Query):
    """Raw (un-analyzed) term-dictionary range scan
    (reference index.rs:109-129)."""

    text: str
