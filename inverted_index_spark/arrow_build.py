"""Fully-vectorized posting assembly for mapInArrow (production path).

The per-doc Python tokenizer costs ~2us/token; at 10^12 turns that is
the entire budget. This module assembles postings for a whole Arrow
batch with no per-token (and, on the ASCII path, no per-doc) Python:

  1. join the batch's ASCII texts into ONE byte buffer ('\\n' separated —
     the separator is whitespace, so it can never sit inside a token);
  2. numpy run-detection over the buffer yields every token's byte span
     and ordinal (same tables as analysis.english_utf8_tokenize_fast,
     which is property-tested equal to the exact tokenizer);
  3. terms become a pyarrow StringArray built straight from the
     lowercased alnum bytes + offsets (no Python strings), then
     dictionary-encoded to int codes;
  4. grouping by (doc, term) = one stable argsort of an int64 key —
     positions stay in scan order within each group, reproducing the
     reference's insertion order (/root/reference/src/util/coalesce.rs:64-73);
  5. posting rows leave as a pyarrow RecordBatch (term, doc_id,
     positions list<struct>, tf) — Arrow end-to-end, no pandas objects.

Non-ASCII documents (rare in transcript corpora) take the exact Python
fallback and are appended as a second small batch. Both paths are
asserted identical to the naive build in tests/test_arrow_build.py.

Used by build.build_and_save for ngrams=False (the BM25/production
index). The parity (edge-ngram) path keeps the Python assembler — its
prefix expansion is test-scale only.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _ASCII_AL_TAB, _ASCII_WS_TAB

POSTINGS_ARROW_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        (
            "positions",
            pa.list_(
                pa.struct(
                    [
                        ("begin", pa.int32()),
                        ("end", pa.int32()),
                        ("pos", pa.int32()),
                    ]
                )
            ),
        ),
        ("tf", pa.int32()),
    ]
)

# lowercase map for ASCII bytes
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A") : ord("Z") + 1] += 32


def _stat_batch(doc_ids, byte_lens) -> pa.RecordBatch:
    """Per-doc stat rows: term = '' (impossible as a real term — the
    analyzer only emits non-empty alnum strings), positions = [],
    tf = doclen_bytes. Lets docstats derive from the postings files
    without a second scan of the corpus."""
    n = len(doc_ids)
    empty_lists = pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)),
        pa.StructArray.from_arrays(
            [pa.array([], type=pa.int32())] * 3, names=["begin", "end", "pos"]
        ),
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array([""] * n, type=pa.string()),
            pa.array(np.asarray(doc_ids, dtype=np.int64), type=pa.int64()),
            empty_lists,
            pa.array(np.asarray(byte_lens, dtype=np.int32), type=pa.int32()),
        ],
        schema=POSTINGS_ARROW_SCHEMA,
    )


def _assemble_ascii(
    texts: List[str], doc_ids: np.ndarray, ngrams: bool = False
) -> pa.RecordBatch:
    """Vectorized assembly of one batch of ASCII docs.

    With ``ngrams=True`` every token additionally expands into all of
    its character prefixes (the reference's index-time
    ``lowercase_ngrams`` chain, tokenizers.rs:222-239,288-293) — still
    no per-token Python: the prefix expansion is np.repeat/arange
    arithmetic and one gather that builds the prefix string buffer.
    """
    joined = "\n".join(texts)
    arr = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    doc_starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]

    al = _ASCII_AL_TAB[arr]
    ai = np.flatnonzero(al)
    if ai.size == 0:
        return pa.RecordBatch.from_pydict(
            {c: [] for c in POSTINGS_ARROW_SCHEMA.names},
            schema=POSTINGS_ARROW_SCHEMA,
        )
    ws = _ASCII_WS_TAB[arr]
    nonws = ~ws
    run_start = nonws.copy()
    run_start[1:] &= ws[:-1]
    rid = np.cumsum(run_start)
    r = rid[ai]
    newtok = np.empty(ai.size, dtype=bool)
    newtok[0] = True
    np.not_equal(r[1:], r[:-1], out=newtok[1:])
    tok_start = np.flatnonzero(newtok)  # first alnum (ai-index) per token
    bounds = np.append(tok_start, ai.size)
    abs_begin = ai[tok_start]
    abs_end = ai[bounds[1:] - 1] + 1

    tok_doc = np.searchsorted(doc_starts, abs_begin, side="right") - 1
    rel_begin = (abs_begin - doc_starts[tok_doc]).astype(np.int32)
    rel_end = (abs_end - doc_starts[tok_doc]).astype(np.int32)
    # ordinal within doc: tok_doc is non-decreasing
    pos = (np.arange(tok_doc.size) - np.searchsorted(tok_doc, tok_doc)).astype(
        np.int32
    )

    clean = _LOWER[arr[ai]]  # lowercased alnum bytes, token-contiguous

    if not ngrams:
        # term strings: tokens are contiguous spans of the cleaned buffer
        term_offsets = bounds.astype(np.int32)
        terms = pa.Array.from_buffers(
            pa.utf8(),
            tok_doc.size,
            [
                None,
                pa.py_buffer(term_offsets.tobytes()),
                pa.py_buffer(clean.tobytes()),
            ],
        )
        occ_doc, occ_begin, occ_end, occ_pos = tok_doc, rel_begin, rel_end, pos
        occ_full = None  # every occurrence is a full token
    else:
        tok_len = np.diff(bounds)  # chars per token
        n_out = int(tok_len.sum())
        occ_tok = np.repeat(np.arange(tok_len.size), tok_len)
        tok_off = np.concatenate(([0], np.cumsum(tok_len)))[:-1]
        # prefix length of each expanded occurrence: 1..tok_len
        plen = (np.arange(n_out) - tok_off[occ_tok] + 1).astype(np.int64)
        occ_doc = tok_doc[occ_tok]
        occ_begin = rel_begin[occ_tok]
        # ngram end counts ONLY kept term chars from begin (the
        # reference's finish accumulator — interior punctuation is not
        # part of the span, tokenizers.rs:222-239)
        occ_end = (occ_begin + plen).astype(np.int32)
        occ_pos = pos[occ_tok]
        occ_full = plen == tok_len[occ_tok]
        # prefix string buffer: for occurrence j, bytes are
        # clean[bounds[tok] : bounds[tok] + plen[j]]
        out_off = np.concatenate(([0], np.cumsum(plen)))
        byte_src = (
            np.repeat(bounds[occ_tok], plen)
            + (np.arange(out_off[-1]) - np.repeat(out_off[:-1], plen))
        )
        terms = pa.Array.from_buffers(
            pa.utf8(),
            n_out,
            [
                None,
                pa.py_buffer(out_off.astype(np.int32).tobytes()),
                pa.py_buffer(clean[byte_src].tobytes()),
            ],
        )

    dict_arr = pc.dictionary_encode(terms)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary

    keys = occ_doc.astype(np.int64) * len(vocab) + codes
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    grp_start = np.concatenate(([0], np.flatnonzero(sk[1:] != sk[:-1]) + 1))
    grp_bounds = np.append(grp_start, sk.size)
    ukeys = sk[grp_start]

    if occ_full is None:
        tfs = np.diff(grp_bounds).astype(np.int32)
    else:
        tfs = np.add.reduceat(
            occ_full[order].astype(np.int32), grp_bounds[:-1]
        ).astype(np.int32)

    positions = pa.ListArray.from_arrays(
        pa.array(grp_bounds, type=pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(occ_begin[order], type=pa.int32()),
                pa.array(occ_end[order], type=pa.int32()),
                pa.array(occ_pos[order], type=pa.int32()),
            ],
            names=["begin", "end", "pos"],
        ),
    )
    return pa.RecordBatch.from_arrays(
        [
            pc.take(vocab, pa.array(ukeys % len(vocab))),
            pa.array(doc_ids[(ukeys // len(vocab))], type=pa.int64()),
            positions,
            pa.array(tfs, type=pa.int32()),
        ],
        schema=POSTINGS_ARROW_SCHEMA,
    )


def _assemble_fallback(
    texts: List[str], doc_ids: List[int], ngrams: bool = False
) -> pa.RecordBatch:
    """Exact Python path for non-ASCII docs (byte-offset semantics)."""
    from .udfs import _analyze_one

    t_col: List[str] = []
    d_col: List[int] = []
    p_col: List[list] = []
    tf_col: List[int] = []
    for doc_id, text in zip(doc_ids, texts):
        per: dict = {}
        for term, b, e, p, full in _analyze_one(text, ngrams):
            ent = per.get(term)
            if ent is None:
                per[term] = ent = ([], [0])
            ent[0].append({"begin": b, "end": e, "pos": p})
            if full:
                ent[1][0] += 1
        for term, (plist, tf) in per.items():
            t_col.append(term)
            d_col.append(doc_id)
            plist.sort(key=lambda q: (q["begin"], q["end"], q["pos"]))
            p_col.append(plist)
            tf_col.append(tf[0])
    return pa.RecordBatch.from_pydict(
        {"term": t_col, "doc_id": d_col, "positions": p_col, "tf": tf_col},
        schema=POSTINGS_ARROW_SCHEMA,
    )


def make_assemble_postings_arrow(ngrams: bool = False):
    """mapInArrow kernel factory: (doc_id, text) batches -> postings.

    ``ngrams=False`` -> production full-token index; ``ngrams=True`` ->
    the reference's parity ``lowercase_ngrams`` index, vectorized (the
    prefix expansion runs as numpy arithmetic, not per-token Python).
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            ascii_texts: List[str] = []
            ascii_ids: List[int] = []
            other_texts: List[str] = []
            other_ids: List[int] = []
            for d, t in zip(doc_ids, texts):
                if t is None:
                    continue
                if t.isascii():
                    ascii_texts.append(t)
                    ascii_ids.append(d)
                else:
                    other_texts.append(t)
                    other_ids.append(d)
            if ascii_texts:
                yield _assemble_ascii(
                    ascii_texts, np.asarray(ascii_ids, np.int64), ngrams
                )
                yield _stat_batch(ascii_ids, [len(t) for t in ascii_texts])
            if other_texts:
                yield _assemble_fallback(other_texts, other_ids, ngrams)
                yield _stat_batch(
                    other_ids, [len(t.encode("utf-8")) for t in other_texts]
                )

    return kernel


# production (full-token) kernel — kept as a module-level function for
# existing call sites
assemble_postings_arrow = make_assemble_postings_arrow(False)


def make_assemble_sorted_arrow(ngrams: bool = False):
    """Partition-sorting kernel: assemble every batch, then emit the
    whole partition (term, doc_id)-sorted in one columnar arrow sort.

    Replaces the downstream ``sortWithinPartitions`` row sort: the sort
    happens on columnar buffers (one sort_indices + gathers) before the
    rows ever cross into the JVM, so the JVM side is a straight
    arrow -> row -> parquet pipeline.
    """
    inner = make_assemble_postings_arrow(ngrams)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pa.set_cpu_count(1)  # never oversubscribe a task slot
        out = list(inner(batches))
        if not out:
            return
        table = pa.Table.from_batches(out).sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        )
        for b in table.to_batches(max_chunksize=65536):
            yield b

    return kernel
