"""Vectorized (Arrow-batched) pandas UDFs.

The ONLY Python that runs on executors in the whole engine is the
tokenizer below — everything downstream (posting assembly, coalescing,
intersection, scoring, top-k) is expressed relationally and stays
JVM-side in whole-stage codegen. Per ``input_hint``: no per-row Python
at the Spark API level; Arrow batches in/out.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .analysis import english_utf8_tokenize_fast as english_utf8_tokenize
from .analysis import utf8_len

TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType(), False),
            StructField("begin", IntegerType(), False),
            StructField("end", IntegerType(), False),
            StructField("pos", IntegerType(), False),
            # True when the term is the complete token (the longest
            # edge-ngram). BM25 tf/df count only these.
            StructField("full", BooleanType(), False),
        ]
    )
)


def _analyze_one(text: str, ngrams: bool) -> List[Tuple[str, int, int, int, bool]]:
    out: List[Tuple[str, int, int, int, bool]] = []
    for tok in english_utf8_tokenize(text):
        if ngrams:
            # edge-ngrams: every char prefix; end offset assumes token
            # bytes contiguous from begin (reference tokenizers.rs:222-239)
            finish = tok.begin
            term = tok.term
            n = len(term)
            for i in range(n):
                finish += utf8_len(term[i])
                out.append(
                    (term[: i + 1].lower(), tok.begin, finish, tok.pos, i == n - 1)
                )
        else:
            out.append((tok.term.lower(), tok.begin, tok.end, tok.pos, True))
    return out


def make_tokenize_udf(ngrams: bool = True):
    """Arrow-batched tokenizer: text -> array<struct<term,begin,end,pos,full>>."""

    @pandas_udf(TOKEN_SCHEMA)
    def tokenize(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _analyze_one(t, ngrams) if t is not None else [])

    return tokenize


POSTINGS_ROW_SCHEMA = (
    "term string, doc_id long, "
    "positions array<struct<begin:int,end:int,pos:int>>, tf int"
)


def assemble_postings_batches(ngrams: bool):
    """mapInPandas kernel: doc rows -> assembled posting rows.

    Every occurrence of a term within one document lands in the same
    Python batch (postings are doc-local), so posting lists can be fully
    assembled here — no exploded-token shuffle, no collect_list
    aggregation. Output rows only need a layout repartition by
    (term, salt). Cuts the build's shuffle volume from one row per token
    occurrence to one row per (term, doc) pair with positions packed.

    Positions are emitted sorted by (begin, end, pos) — the order the
    reference maintains via binary-search insertion
    (/root/reference/src/util/coalesce.rs:64-73).
    """

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms: List[str] = []
            doc_ids: List[int] = []
            positions: List[list] = []
            tfs: List[int] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                per_term: dict = {}
                for term, b, e, p, full in _analyze_one(text, ngrams):
                    entry = per_term.get(term)
                    if entry is None:
                        per_term[term] = entry = ([], [0])
                    entry[0].append({"begin": b, "end": e, "pos": p})
                    if full:
                        entry[1][0] += 1
                for term, (plist, tf) in per_term.items():
                    terms.append(term)
                    doc_ids.append(doc_id)
                    plist.sort(
                        key=lambda q: (q["begin"], q["end"], q["pos"])
                    )
                    positions.append(plist)
                    tfs.append(tf[0])
                # per-doc stat row (term='' is impossible as a real
                # term): tf carries doclen_bytes so docstats can be
                # derived from the postings files alone
                terms.append("")
                doc_ids.append(doc_id)
                positions.append([])
                tfs.append(len(text.encode("utf-8")))
            yield pd.DataFrame(
                {
                    "term": terms,
                    "doc_id": doc_ids,
                    "positions": positions,
                    "tf": tfs,
                }
            )

    return assemble


@pandas_udf(StringType())
def byte_slice_highlight(
    it: Iterator[Tuple[pd.Series, pd.Series, pd.Series, pd.Series]]
) -> Iterator[pd.Series]:
    """highlight(text, positions, before, after) via UTF-8 byte slicing.

    Mirrors reference search_result.rs:54-66: each position's byte range
    is wrapped with before/after markers; positions are sorted and
    non-overlapping (guaranteed by coalescing upstream).
    """
    for texts, position_lists, befores, afters in it:
        out = []
        for text, positions, before, after in zip(
            texts, position_lists, befores, afters
        ):
            if text is None:
                out.append(None)
                continue
            raw = text.encode("utf-8")
            bb = (before or "").encode("utf-8")
            ba = (after or "").encode("utf-8")
            parts = bytearray()
            cursor = 0
            for p in positions if positions is not None else []:
                b, e = int(p["begin"]), int(p["end"])
                parts += raw[cursor:b] + bb + raw[b:e] + ba
                cursor = e
            parts += raw[cursor:]
            out.append(parts.decode("utf-8"))
        yield pd.Series(out, dtype=object)


@pandas_udf(StringType())
def byte_slice_snippet(
    it: Iterator[Tuple[pd.Series, pd.Series, pd.Series, pd.Series, pd.Series]]
) -> Iterator[pd.Series]:
    """snippet(text, positions, frag_bytes, before, after): the
    ``frag_bytes``-byte window centered on the FIRST matched position,
    with every position fully inside the window wrapped.

    Deterministic window rule: ``s = max(0, first.begin - pad)`` with
    ``pad = (frag_bytes - first_width) // 2``, ``e = min(doclen_bytes,
    s + frag_bytes)``. Pure byte arithmetic like the reference's
    highlight (search_result.rs:54-66); a window edge may split a
    multibyte char — the partial sequence is dropped on decode
    (errors='ignore'), a no-op on ASCII. Zero-position rows (e.g.
    Phrase members with no adjacency) yield NULL.
    """
    for texts, position_lists, frags, befores, afters in it:
        out = []
        for text, positions, frag, before, after in zip(
            texts, position_lists, frags, befores, afters
        ):
            if text is None or positions is None or len(positions) == 0:
                out.append(None)
                continue
            raw = text.encode("utf-8")
            frag = int(frag)
            first = positions[0]
            width = int(first["end"]) - int(first["begin"])
            pad = max(0, frag - width) // 2
            s = max(0, int(first["begin"]) - pad)
            e = min(len(raw), s + frag)
            bb = (before or "").encode("utf-8")
            ba = (after or "").encode("utf-8")
            parts = bytearray()
            cursor = s
            for p in positions:
                b, pe = int(p["begin"]), int(p["end"])
                if b < s or pe > e:
                    continue
                parts += raw[cursor:b] + bb + raw[b:pe] + ba
                cursor = pe
            parts += raw[cursor:e]
            out.append(parts.decode("utf-8", errors="ignore"))
        yield pd.Series(out, dtype=object)


def doclen_bytes_col(text_col: str = "text"):
    """UTF-8 byte length of a string column (JVM-side, no UDF)."""
    return F.octet_length(F.col(text_col))
