"""String query language -> the reference ``Query`` AST.

The reference constructs queries programmatically
(/root/reference/src/query.rs:5-27); real users want to type them.
This is engine-surface sugar only: the parser produces exactly the
existing AST nodes, so every execution path (DataFrame engine,
segment evaluator, explain) and every correctness oracle applies
unchanged.

Grammar (whitespace-insensitive between tokens):

    expr    := and_expr ( OR and_expr )*
    and_expr:= ( atom | NOT atom )+ with optional AND separators,
               at least one positive atom required
    atom    := '(' expr ')' | '"' words '"' | word '*' | words

* ``OR`` / ``AND`` / ``NOT`` are case-sensitive keywords (uppercase),
  so the lowercase English words "and" / "or" / "not" remain
  searchable terms.
* ``NOT atom`` subtracts the atom's doc set from the surrounding AND
  group (``a AND NOT b`` -> ``AndNot(a, b)``; several NOT atoms union:
  ``a NOT b NOT c`` -> ``AndNot(a, Or(b, c))``). A group of only NOT
  atoms is an error — negation is bounded, never a corpus scan.
* A run of bare words is ONE ``Match`` bag ("scan merge" scores docs
  containing either term, like the reference's multi-token Match) —
  use explicit AND for intersection.
* ``"..."`` is a ``Phrase`` (adjacent-pair positional semantics,
  single-word phrase matches nothing — reference index.rs:88-107).
* ``word*`` is a raw ``Prefix`` range scan of everything before the
  ``*``. The star binds only at the end of a bare word.
* any other ``*``/``?`` placement makes the token a raw dictionary
  ``Wildcard`` (``sc?n``, ``mer*e``; ``?`` = one char, ``*`` = any run).
* ``word~`` / ``word~2`` is a ``Fuzzy`` edit-distance match;
  ``"a b"~3`` is an ordered ``Near`` proximity match.
* ``\\`` escapes the next (non-space) character: ``\\*`` ``\\?`` ``\\~``
  ``\\(`` ``\\)`` ``\\"`` ``\\\\`` are literal characters of the term,
  and ``\\AND`` / ``\\OR`` / ``\\NOT`` are the ordinary uppercase words.
  The analyzer keeps punctuation inside tokens, so terms like ``a*b``
  or ``don"t`` ARE indexed — the escape makes them reachable from the
  string language (``a\\*b``). There is no escape for whitespace (it is
  always the token separator) and none inside ``"..."`` phrase bodies.

COMPATIBILITY NOTE: ``*``, ``?`` and ``~`` are metacharacters (since
the Wildcard/Fuzzy forms landed); earlier revisions lexed them as
ordinary word characters. A bare ``a?b`` now parses as a Wildcard and
``x~y`` is a parse error — write ``a\\?b`` / ``x\\~y`` for the literal
terms.

Examples::

    parse_query('scan merge')                 -> Match('scan merge')
    parse_query('scan AND merge')             -> And(Match, Match)
    parse_query('a AND (b OR "c d") pre*')    -> And over a nested Or,
                                                 the trailing atoms
                                                 joining the AND bag
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .qast import (
    And,
    AndNot,
    AtLeast,
    Fuzzy,
    Match,
    Near,
    Or,
    Phrase,
    Prefix,
    Query,
    Regex,
    Wildcard,
)

__all__ = [
    "parse_query", "render_query", "QueryParseError", "expand_synonyms",
]


def expand_synonyms(q: Query, synonyms) -> Query:
    """Query-time synonym expansion (Lucene SynonymQuery / ES synonym
    filter applied at the QUERY side — the index stays unexpanded, so
    the synonym table can change without a rebuild).

    Every analyzed ``Match`` term with an entry in ``synonyms``
    ({term: [synonym, ...]}, analyzed-lowercase keys) widens to
    ``Or(Match(term), Match(syn), ...)``; a multi-word Match is already
    a union of its terms (reference index.rs:76-86), so it splits
    per-term and re-unions. ONLY Match leaves rewrite: positional nodes
    (Phrase/Near) would need graph-token offsets to stay correct, and
    raw dictionary nodes (Prefix/Wildcard/Regex/Fuzzy) are term-set
    operators already — all pass through untouched, as do the combinators
    (And/Or/AndNot/AtLeast recurse). Nodes without a synonym hit are
    returned AS-IS (object identity preserved — cheap no-op when the
    table misses).
    """
    from .analysis import analyze_query

    syn = {str(k).lower(): list(v) for k, v in dict(synonyms).items()}
    if not syn:
        return q
    if isinstance(q, Match):
        terms: List[str] = []
        for tok in analyze_query(q.text):
            if tok.term not in terms:
                terms.append(tok.term)
        if not any(t in syn and syn[t] for t in terms):
            return q
        parts: List[Query] = []
        for t in terms:
            if t in syn and syn[t]:
                parts.append(Or(Match(t), *[Match(s) for s in syn[t]]))
            else:
                parts.append(Match(t))
        return parts[0] if len(parts) == 1 else Or(*parts)
    if isinstance(q, And):
        return And(*[expand_synonyms(c, syn) for c in q.children])
    if isinstance(q, Or):
        return Or(*[expand_synonyms(c, syn) for c in q.children])
    if isinstance(q, AtLeast):
        return AtLeast(q.m, *[expand_synonyms(c, syn) for c in q.children])
    if isinstance(q, AndNot):
        return AndNot(
            expand_synonyms(q.positive, syn),
            expand_synonyms(q.negative, syn),
        )
    return q


class QueryParseError(ValueError):
    """Raised for malformed query strings (position included)."""


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<phrase>"(?P<phrase_body>[^"]*)")(?:~(?P<slop>\d+)(?![^\s()"~]))? |
        (?P<word>(?:\\[^\s]|[^\s()"~\\])+)(?:~(?P<fuzz>\d*)(?![^\s()"~]))? |
        (?P<badtilde>~)
    )""",
    re.VERBOSE,
)


def _unescape_word(w: str) -> Tuple[str, bool, List[int]]:
    """Raw word token -> (literal text, had_escapes, unescaped ``*?``
    positions in the literal text). ``\\x`` contributes the literal
    character ``x``; an unescaped ``*`` / ``?`` is a wildcard
    metacharacter and its position is recorded."""
    lit: List[str] = []
    wild: List[int] = []
    escaped = False
    i = 0
    while i < len(w):
        c = w[i]
        if c == "\\":
            # the lexer regex guarantees a non-space char follows
            lit.append(w[i + 1])
            escaped = True
            i += 2
        else:
            if c in "*?":
                wild.append(len(lit))
            lit.append(c)
            i += 1
    return "".join(lit), escaped, wild


def _lex(s: str) -> List[Tuple[str, str, int]]:
    out: List[Tuple[str, str, int]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None or m.end() == m.start():
            if s[pos:].strip() == "":
                break
            raise QueryParseError(f"cannot tokenize at position {pos}: {s[pos:]!r}")
        if m.group("lparen"):
            out.append(("(", "(", m.start()))
        elif m.group("rparen"):
            out.append((")", ")", m.start()))
        elif m.group("phrase") is not None:
            if m.group("slop") is not None:
                slop = int(m.group("slop"))
                if slop < 1:
                    raise QueryParseError(
                        f'proximity slop must be >= 1 at position {m.start()}'
                    )
                out.append(("near", (m.group("phrase_body"), slop), m.start()))
            else:
                out.append(("phrase", m.group("phrase_body"), m.start()))
        elif m.group("word"):
            w = m.group("word")
            text, escaped, wildpos = _unescape_word(w)
            wild = bool(wildpos)
            if m.group("fuzz") is not None:
                if wild:
                    raise QueryParseError(
                        f"fuzzy '~' cannot follow a wildcard pattern "
                        f"at position {m.start()}"
                    )
                edits = int(m.group("fuzz")) if m.group("fuzz") else 1
                if not 1 <= edits <= 2:
                    raise QueryParseError(
                        f"fuzzy edits must be 1 or 2 at position {m.start()}"
                    )
                out.append(("fuzzy", (text, edits), m.start()))
            elif wild:
                if len(wildpos) == len(text):
                    raise QueryParseError(
                        f"wildcard pattern {w!r} at position {m.start()} "
                        "has no literal characters — it matches the whole "
                        "dictionary (prefix form is word*, wildcards are "
                        "sc?n / mer*e)"
                    )
                # trailing-star-only (the star may follow escaped
                # literals: `foo\**` is Prefix("foo*")) -> Prefix
                if (
                    len(wildpos) == 1
                    and wildpos[0] == len(text) - 1
                    and text.endswith("*")
                ):
                    out.append(("prefix", text[:-1], m.start()))
                    pos = m.end()
                    continue
                if escaped:
                    raise QueryParseError(
                        f"pattern {w!r} at position {m.start()} mixes "
                        "escaped literal characters with wildcard "
                        "metacharacters — a Wildcard pattern cannot "
                        "contain a literal '*' or '?'"
                    )
                out.append(("wildcard", text, m.start()))
            elif not escaped and w in ("AND", "OR", "NOT"):
                out.append((w, w, m.start()))
            else:
                out.append(("word", text, m.start()))
        elif m.group("badtilde"):
            raise QueryParseError(
                f"dangling '~' at position {m.start()} "
                '(fuzzy form is word~ or word~2, proximity is "a b"~3)'
            )
        pos = m.end()
    if '"' in s and re.sub(r"\\.", "", s).count('"') % 2:
        raise QueryParseError("unbalanced quote")
    return out


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str, int]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        if t is not None:
            self.i += 1
        return t

    def expr(self) -> Query:
        parts = [self.and_expr()]
        while self.peek() is not None and self.peek()[0] == "OR":
            self.take()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Or(*parts)

    def and_expr(self) -> Query:
        parts: List[Query] = []
        negs: List[Query] = []
        first = True
        while True:
            t = self.peek()
            if t is None or t[0] in (")", "OR"):
                break
            if not first and t[0] == "AND":
                self.take()
                t = self.peek()
                if t is None or t[0] in (")", "OR", "AND"):
                    raise QueryParseError("AND missing right operand")
            if t is not None and t[0] == "NOT":
                self.take()
                t = self.peek()
                if t is None or t[0] in (")", "OR", "AND", "NOT"):
                    raise QueryParseError("NOT missing operand")
                negs.append(self.atom())
            else:
                # juxtaposed atoms join the AND bag too ("a (b OR c)")
                parts.append(self.atom())
            first = False
        if not parts:
            if negs:
                raise QueryParseError(
                    "NOT needs a positive operand to subtract from"
                )
            raise QueryParseError("unexpected end of query")
        pos = parts[0] if len(parts) == 1 else And(*parts)
        if not negs:
            return pos
        return AndNot(pos, negs[0] if len(negs) == 1 else Or(*negs))

    def atom(self) -> Query:
        t = self.take()
        if t is None:
            raise QueryParseError("unexpected end of query")
        kind, val, pos = t
        if kind == "(":
            inner = self.expr()
            closing = self.take()
            if closing is None or closing[0] != ")":
                raise QueryParseError(f"unclosed '(' at position {pos}")
            return inner
        if kind == "phrase":
            return Phrase(val)
        if kind == "near":
            return Near(val[0], val[1])
        if kind == "fuzzy":
            return Fuzzy(val[0], val[1])
        if kind == "prefix":
            return Prefix(val)
        if kind == "wildcard":
            return Wildcard(val)
        if kind == "word":
            # greedily absorb following bare words into ONE Match bag
            words = [val]
            while self.peek() is not None and self.peek()[0] == "word":
                words.append(self.take()[1])
            return Match(" ".join(words))
        raise QueryParseError(f"unexpected {val!r} at position {pos}")


def render_query(q: Query) -> str:
    """Inverse of :func:`parse_query`: render an AST back to the string
    language, such that ``parse_query(render_query(q)) == q`` (pinned
    by a hypothesis round-trip property).

    Nested same-type And/Or children are parenthesized so the tree
    SHAPE survives (``And(And(a,b),c)`` is not flattened), Or children
    inside And get precedence parens, and a multi-word ``Match`` stays
    one bag because operators are always explicit. Literal special
    characters and the AND/OR/NOT keywords render with backslash
    escapes (``a\\*b``, ``\\AND``). Still not renderable —
    ``ValueError``: words containing whitespace (no escape form), a
    quote inside a Phrase/Near body, an empty ``Prefix``, zero-child
    And/Or, and Wildcard patterns containing specials/whitespace (a
    literal ``*``/``?`` inside a Wildcard is inexpressible in the AST).
    """
    def bad_word(w: str) -> bool:
        # special characters are escapable; whitespace is the token
        # separator and has no escape form
        return not w or any(c.isspace() for c in w)

    def esc_word(w: str) -> str:
        """Escape literal specials so the word re-lexes to exactly this
        text: ``\\`` before each of ``\\ ( ) " ~ * ?``, and a leading
        ``\\`` to defuse the AND/OR/NOT keywords."""
        s = re.sub(r'([\\()"~*?])', r"\\\1", w)
        if s in ("AND", "OR", "NOT"):
            s = "\\" + s
        return s

    if isinstance(q, Match):
        if not q.text.strip():
            return ""
        words = q.text.split()
        if any(bad_word(w) for w in words):
            raise ValueError(f"Match text not renderable: {q.text!r}")
        return " ".join(esc_word(w) for w in words)
    if isinstance(q, Phrase):
        if '"' in q.text:
            raise ValueError("Phrase text contains a quote")
        return f'"{q.text}"'
    if isinstance(q, Near):
        if '"' in q.text:
            raise ValueError("Near text contains a quote")
        if "~" in q.text or q.slop < 1:
            raise ValueError(f"Near not renderable: {q!r}")
        return f'"{q.text}"~{q.slop}'
    if isinstance(q, Fuzzy):
        if (
            bad_word(q.text)
            or len(q.text.split()) != 1
            or q.max_edits not in (1, 2)
            or q.max_expansions != Fuzzy("x").max_expansions
        ):
            raise ValueError(f"Fuzzy not renderable: {q!r}")
        w = esc_word(q.text)
        return f"{w}~" if q.max_edits == 1 else f"{w}~2"
    if isinstance(q, Prefix):
        if bad_word(q.text):
            raise ValueError(f"Prefix not renderable: {q.text!r}")
        return f"{esc_word(q.text)}*"
    if isinstance(q, Wildcard):
        p = q.pattern
        has_wild = "*" in p or "?" in p
        if (
            not p
            or not has_wild  # bare word: parses as Match
            or all(c in "*?" for c in p)  # no literals: parse error form
            # trailing-star-only: parses back as Prefix — use Prefix
            or (p.endswith("*") and not any(c in "*?" for c in p[:-1]))
            # escaping a literal inside a Wildcard is inexpressible in
            # the AST (every * / ? in the pattern IS a metacharacter),
            # so specials and backslashes stay unrenderable here
            or any(c in p for c in '()"~\\')
            or any(c.isspace() for c in p)
        ):
            raise ValueError(f"Wildcard not renderable: {p!r}")
        return p
    if isinstance(q, AndNot):
        ps = render_query(q.positive)
        if ps == "":
            raise ValueError("empty Match inside a compound query")
        # Or positive needs precedence parens; AndNot positive needs
        # shape parens (an unparenthesized chain of NOTs re-associates
        # into one AndNot with an Or negative)
        if isinstance(q.positive, (Or, AndNot)):
            ps = f"({ps})"
        ns = render_query(q.negative)
        if ns == "":
            raise ValueError("empty Match inside a compound query")
        if isinstance(q.negative, (And, Or, AndNot)):
            ns = f"({ns})"
        return f"{ps} AND NOT {ns}"
    if isinstance(q, (And, Or)):
        if not q.children:
            raise ValueError("zero-child And/Or is not renderable")
        op = " AND " if isinstance(q, And) else " OR "
        parts = []
        for c in q.children:
            s = render_query(c)
            need_parens = (
                type(c) is type(q)  # preserve nesting shape
                or (isinstance(q, And) and isinstance(c, Or))  # precedence
                # a bare NOT inside an And re-associates to the whole
                # group ("a AND NOT b AND c" parses as (a AND c) NOT b)
                or (isinstance(q, And) and isinstance(c, AndNot))
                or s == ""  # empty Match needs explicit grouping... none exists
            )
            if s == "":
                raise ValueError("empty Match inside a compound query")
            parts.append(f"({s})" if need_parens else s)
        return op.join(parts)
    if isinstance(q, AtLeast):
        raise ValueError(
            "AtLeast has no string form (the query-string grammar stays "
            "the reference's boolean algebra) — construct it via the AST"
        )
    if isinstance(q, Regex):
        raise ValueError(
            "Regex has no string form (regex metacharacters would "
            "collide with the query grammar's own * ? ~ lexing) — "
            "construct it via the AST"
        )
    raise TypeError(f"unknown query node: {q!r}")


def parse_query(s: str) -> Query:
    """Parse a query string into the reference ``Query`` AST.

    Empty / whitespace-only input parses to ``Match("")`` (which the
    engine evaluates to the empty result, matching the reference's
    empty-query behavior)."""
    tokens = _lex(s)
    if not tokens:
        return Match("")
    p = _Parser(tokens)
    q = p.expr()
    left = p.peek()
    if left is not None:
        raise QueryParseError(
            f"unexpected {left[1]!r} at position {left[2]}"
        )
    return q
