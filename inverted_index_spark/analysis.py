"""Text analysis chain: tokenize -> edge-ngrams -> lowercase.

Reimplements, from scratch in Python, the analyzer semantics of the
reference engine (``/root/reference/src/tokenizers.rs``):

* ``english_utf8_tokenize`` — streaming whitespace tokenizer over UTF-8
  (reference ``EnglishUtf8::read``, tokenizers.rs:128-179): whitespace
  terminates a token; non-alphanumeric characters are skipped *without*
  terminating the token (``Won't`` -> token ``Wont``); offsets are UTF-8
  **byte** offsets ``[first_alnum_byte, byte_after_last_alnum)``; the
  position is the token ordinal within the document.
* ``edge_ngrams`` — every character-prefix of a token becomes a term
  (reference ``NgramsFilter``, tokenizers.rs:212-244). Each prefix keeps
  the parent token's ordinal; its byte range is
  ``(token_begin, token_begin + utf8_len(prefix))``. NOTE (parity): for
  tokens with interior punctuation the prefix end offsets assume the
  token bytes are contiguous from ``token_begin`` — exactly like the
  reference, which computes ``char_indices`` over the *cleaned* token.
* lowercasing happens **after** ngramming (reference ``lowercase_ngrams``,
  tokenizers.rs:288-293) and applies full Unicode lowercase per term, so
  a term's byte length can differ from its source range ('İ' -> 'i̇',
  reference test ``char_len_change`` index.rs:399-406).

These run on the driver for query strings and inside Arrow-batched
pandas UDFs for document text (see udfs.py) — never per-row Python at
the Spark API level.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

__all__ = [
    "Token",
    "english_utf8_tokenize",
    "english_utf8_tokenize_fast",
    "analyze_index",
    "analyze_query",
    "utf8_len",
]

# Unicode White_Space property (what Rust char::is_whitespace checks).
# Python str.isspace() also returns True for U+001C..U+001F which do NOT
# have the White_Space property, so we pin the exact set.
_WHITESPACE = frozenset(
    chr(cp)
    for cp in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
)


class Token(NamedTuple):
    """Analyzer output unit: term text + byte range + token ordinal."""

    term: str
    begin: int  # UTF-8 byte offset, inclusive
    end: int  # UTF-8 byte offset, exclusive
    pos: int  # token ordinal in the document


def utf8_len(ch: str) -> int:
    """UTF-8 encoded byte length of a single code point."""
    cp = ord(ch)
    if cp < 0x80:
        return 1
    if cp < 0x800:
        return 2
    if cp < 0x10000:
        return 3
    return 4


def english_utf8_tokenize(text: str) -> List[Token]:
    """Whitespace tokenizer with byte offsets.

    Rules (reference tokenizers.rs:142-177):
      * whitespace ends the current token (if any);
      * non-alphanumeric, non-whitespace chars are dropped but do NOT
        end the token ("Hi," -> ("Hi", 0, 2); "Won't" -> "Wont");
      * ``begin`` is the byte offset of the token's first alnum char,
        ``end`` is the byte offset just after its last alnum char.
    """
    tokens: List[Token] = []
    offset = 0  # running UTF-8 byte offset
    buf: List[str] = []
    begin = 0
    end = 0
    n_tokens = 0
    for ch in text:
        if ch in _WHITESPACE:
            offset += utf8_len(ch)
            if buf:
                tokens.append(Token("".join(buf), begin, end, n_tokens))
                n_tokens += 1
                buf = []
            continue
        if not ch.isalnum():
            offset += utf8_len(ch)
            continue
        if not buf:
            begin = offset
        offset += utf8_len(ch)
        buf.append(ch)
        end = offset
    if buf:
        tokens.append(Token("".join(buf), begin, end, n_tokens))
    return tokens


# ASCII classification tables for the vectorized fast path. ASCII
# whitespace with the White_Space property = \t \n \v \f \r space —
# identical to Rust char::is_whitespace on this range; ASCII alnum =
# [0-9A-Za-z] — identical to char::is_alphanumeric (no underscore).
_ASCII_WS_TAB = np.zeros(256, dtype=bool)
_ASCII_WS_TAB[[0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20]] = True
_ASCII_AL_TAB = np.zeros(256, dtype=bool)
_ASCII_AL_TAB[ord("0") : ord("9") + 1] = True
_ASCII_AL_TAB[ord("A") : ord("Z") + 1] = True
_ASCII_AL_TAB[ord("a") : ord("z") + 1] = True


def english_utf8_tokenize_fast(text: str) -> List[Token]:
    """Vectorized tokenizer for ASCII text; exact fallback otherwise.

    Produces byte-for-byte the same tokens as ``english_utf8_tokenize``
    (property-tested in tests/test_analysis.py): for ASCII, byte offsets
    equal char offsets, and the whitespace/alnum tables above match the
    Unicode predicates on the ASCII range, so the numpy run-detection
    below is an exact reimplementation ~10x faster per char.
    """
    if not text.isascii():
        return english_utf8_tokenize(text)
    arr = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    if arr.size == 0:
        return []
    ws = _ASCII_WS_TAB[arr]
    al = _ASCII_AL_TAB[arr]
    ai = np.flatnonzero(al)
    if ai.size == 0:
        return []
    # token runs = maximal whitespace-free spans; punctuation inside a
    # run is dropped from the term but does not split it
    nonws = ~ws
    run_start = nonws.copy()
    run_start[1:] &= ws[:-1]
    rid = np.cumsum(run_start)
    r = rid[ai]
    newtok = np.empty(ai.size, dtype=bool)
    newtok[0] = True
    np.not_equal(r[1:], r[:-1], out=newtok[1:])
    starts = np.flatnonzero(newtok)
    bounds = np.append(starts, ai.size)
    begins = ai[starts]
    ends = ai[bounds[1:] - 1] + 1
    tokens: List[Token] = []
    for pos, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        idx = ai[s:e]
        # contiguous spans slice the original string (common case);
        # interior punctuation takes the fancy-indexed path
        if idx[-1] - idx[0] + 1 == idx.size:
            term = text[idx[0] : idx[-1] + 1]
        else:
            term = arr[idx].tobytes().decode("ascii")
        tokens.append(Token(term, int(begins[pos]), int(ends[pos]), pos))
    return tokens


def _edge_ngrams(tok: Token) -> List[Token]:
    """All character-prefixes of one token (reference tokenizers.rs:222-239).

    Prefix ``tok.term[:i]`` gets byte range
    ``(tok.begin, tok.begin + utf8_len(term[:i]))`` and the parent ordinal.
    """
    out: List[Token] = []
    finish = tok.begin
    term = tok.term
    for i, ch in enumerate(term):
        finish += utf8_len(ch)
        out.append(Token(term[: i + 1], tok.begin, finish, tok.pos))
    return out


def analyze_index(text: str, ngrams: bool = True) -> List[Token]:
    """Index-time analyzer: tokenize -> (edge-ngrams) -> lowercase.

    With ``ngrams=True`` this is the reference's ``lowercase_ngrams``
    chain (tokenizers.rs:288-293). With ``ngrams=False`` it produces the
    full-token terms used by the production BM25 index.
    """
    out: List[Token] = []
    for tok in english_utf8_tokenize(text):
        if ngrams:
            for ng in _edge_ngrams(tok):
                out.append(Token(ng.term.lower(), ng.begin, ng.end, ng.pos))
        else:
            out.append(Token(tok.term.lower(), tok.begin, tok.end, tok.pos))
    return out


def analyze_query(text: str) -> List[Token]:
    """Query-time analyzer: tokenize -> lowercase, NO ngrams.

    Mirrors the reference's use of ``LowercaseFilter::from_bytes`` for
    Match (index.rs:76-79) and Phrase (index.rs:88-93).
    """
    return [
        Token(t.term.lower(), t.begin, t.end, t.pos)
        for t in english_utf8_tokenize(text)
    ]
