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
    "Near", "Fuzzy", "Wildcard", "AtLeast", "Regex", "Phonetic",
    "regex_parse",
]


# ----------------------------------------------------------------------
# Regex pattern validation (dialect-stable subset)
#
# A Regex query must produce IDENTICAL whole-term membership under
# three engines: Java regex (Spark ``rlike``), RE2 (DuckDB
# ``regexp_full_match``) and Python ``re.fullmatch`` (the segment
# planner's driver-side dictionary expansion and the test oracle).
# The grammar below is the intersection on which all three agree
# exactly; everything else is rejected UP FRONT with a ValueError so a
# dialect divergence can never silently change a result set:
#
#     alt    := concat ('|' concat)*
#     concat := atomq*
#     atomq  := atom quant?
#     atom   := literal | '\' metachar | '.' | class | '(' alt ')'
#     quant  := '*' | '+' | '?' | '{' m '}' | '{' m ',' '}' | '{' m ',' n '}'
#     class  := '[' '^'? item+ ']'       item := literal | literal '-' literal
#
# Deliberately rejected (divergent or error-behavior-unstable across
# the three engines): anchors ``^``/``$`` (matching is implicitly
# whole-term, like Lucene RegexpQuery), every ``(?...`` group
# construct, backslash escapes other than a single metacharacter
# (``\d``/``\w``/``\b`` have per-engine Unicode semantics), stacked
# quantifiers (``*?`` lazy / ``*+`` possessive differ), ``&`` inside a
# class (Java ``&&`` intersection), ``\``/``[`` inside a class, empty
# classes/branches-with-bad-bounds, bare ``]``/``}``/``{`` outside
# their constructs (literal in some engines, an error in others),
# repetition bounds above 1000 (the RE2 limit — larger bounds error on
# one engine only), and UNBOUNDED quantifiers on non-deterministic
# groups (``(a*)*`` / ``(a|aa)*`` shapes: linear on RE2 but
# exponential backtracking on the Java/Python evaluators; ``(ab)*``
# and single-distinct-char alternations like ``(y|z)*`` stay legal).

_RX_ESCAPABLE = set("\\.[](){}*+?|^$-/")
_RX_QUANT_START = set("*+?{")


class _RxScan:
    __slots__ = ("p", "i", "n")

    def __init__(self, p: str):
        self.p, self.i, self.n = p, 0, len(p)

    def peek(self) -> str:
        return self.p[self.i] if self.i < self.n else ""

    def take(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def err(self, msg: str) -> ValueError:
        return ValueError(
            f"Regex pattern {self.p!r}: {msg} at position {self.i} — only "
            "the dialect-stable subset (literals, '\\'-escaped "
            "metacharacters, '.', simple [] classes, (), |, * + ? {m,n}) "
            "is supported"
        )


def _rx_class(s: _RxScan) -> None:
    if s.peek() == "^":
        s.take()
    prev = None  # last literal eligible as a range start
    n_items = 0
    while True:
        ch = s.peek()
        if ch == "":
            raise s.err("unterminated character class")
        if ch == "]":
            s.take()
            if n_items == 0:
                raise s.err("empty character class")
            return
        if ch in "\\[&":
            raise s.err(f"{ch!r} inside a character class")
        s.take()
        if ch == "-" and prev is not None and s.peek() not in ("]", ""):
            hi = s.peek()
            if hi in "\\[&":
                raise s.err(f"{hi!r} inside a character class")
            s.take()
            if ord(hi) < ord(prev):
                raise s.err(f"reversed range {prev}-{hi}")
            prev = None
        else:
            prev = ch if ch != "-" else None
        n_items += 1


# RE2 (DuckDB) rejects repetition bounds above 1000; Java and Python
# accept them — a larger bound would be a divergent ERROR surface, so
# the validator pins the common limit.
_RX_MAX_BOUND = 1000


def _rx_quant(s: _RxScan) -> Tuple[bool, "int | None"]:
    """Consume one quantifier if present; ``(consumed, max_reps)``
    where ``max_reps`` is the quantifier's repetition ceiling (None =
    unbounded)."""
    ch = s.peek()
    if ch and ch in "*+?":
        s.take()
        nxt = s.peek()
        if nxt and nxt in "*+?":
            raise s.err("stacked quantifiers (lazy/possessive forms)")
        return True, (1 if ch == "?" else None)
    if ch == "{":
        s.take()
        lo = ""
        while s.peek().isdigit():
            lo += s.take()
        if not lo:
            raise s.err("bound {m[,n]} needs digits")
        hi = None
        if s.peek() == ",":
            s.take()
            hi = ""
            while s.peek().isdigit():
                hi += s.take()
            hi = None if hi == "" else hi
        else:
            hi = lo  # {m} == {m,m}
        if s.peek() != "}":
            raise s.err("unterminated {m,n} bound")
        s.take()
        if int(lo) > _RX_MAX_BOUND or (hi is not None and int(hi) > _RX_MAX_BOUND):
            raise s.err(
                f"repetition bound above {_RX_MAX_BOUND} (the RE2 limit "
                "— larger bounds error on one engine only)"
            )
        if hi is not None and int(hi) < int(lo):
            raise s.err(f"reversed bound {{{lo},{hi}}}")
        if s.peek() in _RX_QUANT_START:
            raise s.err("stacked quantifiers")
        return True, (None if hi is None else int(hi))
    return False, 0


def _rx_concat(s: _RxScan, depth: int) -> Tuple[list, bool, bool]:
    """Parse one alternation branch. Returns ``(atoms, any_quant,
    any_alt)``: per-atom ``(literal_or_None, quantified)`` records
    (literal = the unescaped char when the atom is a single literal
    character), plus whether the branch contains any quantifier or any
    alternation at ANY depth (group-body metadata for the
    backtracking-safety check below)."""
    atoms = []
    any_quant = False
    any_alt = False
    while True:
        ch = s.peek()
        if ch == "" or ch == "|" or (ch == ")" and depth > 0):
            return atoms, any_quant, any_alt
        if ch in "^$":
            raise s.err("anchors (matching is whole-term already)")
        if ch in "*+?{":
            raise s.err("quantifier with nothing to repeat")
        if ch in ")]}":
            raise s.err(f"unbalanced {ch!r}")
        lit = None
        grp = None  # (branches, inner_quant, inner_alt) for group atoms
        if ch == "\\":
            s.take()
            nxt = s.peek()
            if nxt == "" or nxt not in _RX_ESCAPABLE:
                raise s.err(
                    f"escape '\\{nxt}' (only metacharacter escapes are "
                    "dialect-stable)"
                )
            lit = s.take()
        elif ch == "(":
            s.take()
            if s.peek() == "?":
                raise s.err("'(?...' group constructs")
            grp = _rx_alt(s, depth + 1)
            if s.peek() != ")":
                raise s.err("unbalanced '('")
            s.take()
        elif ch == "[":
            s.take()
            _rx_class(s)
        elif ch == ".":
            s.take()
        else:
            lit = s.take()
        quant, max_reps = _rx_quant(s)
        if grp is not None:
            g_branches, g_quant, g_alt = grp
            any_quant |= g_quant
            any_alt |= g_alt or len(g_branches) > 1
            if quant and (max_reps is None or max_reps > 10):
                # exponential-backtracking guard for the Java evaluator
                # (RE2 is immune; Python is not): a many-repetition
                # quantifier on a group is safe only when the body is
                # deterministic — no inner quantifier anywhere, and any
                # alternation is exactly the top-level one with single
                # DISTINCT literal-char branches ((y|z)* fine, (a|aa)*
                # / (a|.)* / (a*)* rejected; small bounds like
                # (a|aa){0,3} stay legal — ambiguity is capped).
                simple_alt = (
                    not g_quant
                    and not g_alt
                    and all(
                        len(b) == 1 and b[0][0] is not None and not b[0][1]
                        for b in g_branches
                    )
                    and len({b[0][0] for b in g_branches}) == len(g_branches)
                )
                single_literal_run = len(g_branches) == 1 and not g_quant \
                    and not g_alt and all(
                        a[0] is not None and not a[1] for a in g_branches[0]
                    )
                if not (simple_alt or single_literal_run):
                    raise s.err(
                        "unbounded/large-bound quantifier on a "
                        "non-deterministic group (exponential "
                        "backtracking on the Java evaluator) — bound "
                        "it ({m,n}, n <= 10) or simplify the group to "
                        "literals / a single-char alternation"
                    )
        any_quant |= quant
        atoms.append((lit, quant))


def _rx_alt(s: _RxScan, depth: int) -> Tuple[list, bool, bool]:
    """(branches, any_quant_inside, any_alt_inside) — the aggregate
    flags cover every depth below this point (branch count at THIS
    level is len(branches), reported by the caller)."""
    atoms, q, a = _rx_concat(s, depth)
    branches = [atoms]
    while s.peek() == "|":
        s.take()
        atoms, q2, a2 = _rx_concat(s, depth)
        branches.append(atoms)
        q |= q2
        a |= a2
    return branches, q, a


def regex_parse(pattern: str) -> Tuple[str, "str | None"]:
    """Validate ``pattern`` against the dialect-stable subset (see the
    grammar comment above) and return ``(literal_prefix, literal)``:

    - ``literal_prefix`` — the unescaped literal characters every match
      must start with (the sargable term-dictionary band; ``""`` when
      the pattern starts with a non-literal atom or has a top-level
      alternation).
    - ``literal`` — the full unescaped string when the pattern is one
      branch of only unquantified literal atoms (an exact dictionary
      lookup), else ``None``.

    Raises ``ValueError`` for anything outside the subset, so a Java /
    RE2 / Python divergence can never silently change a result set.
    """
    s = _RxScan(pattern)
    branches, _, _ = _rx_alt(s, 0)
    if s.i != s.n:  # unconsumed ')' at depth 0
        raise s.err(f"unbalanced {s.peek()!r}")
    if len(branches) != 1:
        return "", None
    atoms = branches[0]
    prefix_chars = []
    for lit, quant in atoms:
        if lit is None or quant:
            return "".join(prefix_chars), None
        prefix_chars.append(lit)
    lit_all = "".join(prefix_chars)
    return lit_all, lit_all


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
class Phonetic(Query):
    """Sounds-like term match: the analyzed query term expands to
    every distinct indexed FULL TOKEN whose American Soundex code
    equals the query term's (oracle.soundex == Spark ``F.soundex``,
    parity pinned), capped at the ``max_expansions`` highest-df tokens
    (df desc, term asc — the same cap contract as Fuzzy); the result
    is the union of their exact-token matches.

    Engine EXTENSION (Lucene PhoneticFilter/phonetic-query analog; no
    phonetic matching in the reference). Full-token indexes only, one
    analyzed term per node (compose with And/Or). A soundex code's
    first letter equals the term's first letter, so the dictionary
    scan prunes to that letter's range — never the whole vocabulary.
    AST-only (no string-query form).
    """

    text: str
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
class Regex(Query):
    """Raw (un-analyzed) dictionary regular-expression match: the
    pattern must match WHOLE dictionary terms (implicitly anchored,
    like Lucene RegexpQuery) and is restricted to the dialect-stable
    subset validated by :func:`regex_parse` — literals, ``\\``-escaped
    metacharacters, ``.``, simple ``[]`` classes (ranges, leading ``^``
    negation), grouping ``()``, alternation ``|`` and the quantifiers
    ``* + ? {m} {m,} {m,n}`` — exactly the grammar on which Java
    (Spark ``rlike``), RE2 (DuckDB) and Python ``re`` agree, so every
    physical path returns identical membership. Anything outside the
    subset raises ``ValueError`` at construction.

    Engine EXTENSION (Lucene RegexpQuery analog; the reference's only
    dictionary operator is Prefix, query.rs:23-25). Completes the
    multi-term family: Prefix ⊂ Wildcard ⊂ Regex. The pattern's
    leading literal run prunes as a sargable term range; a pattern with
    no literal lead scans the whole dictionary — legal, but O(vocab).
    Empty pattern -> empty result (mirrors Prefix/Wildcard).
    """

    pattern: str

    def __post_init__(self):
        if self.pattern:
            regex_parse(self.pattern)


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
