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

Used by build.build_and_save for both index flavors:
make_assemble_postings_arrow(ngrams=True) expands edge n-grams with the
same numpy span arithmetic (parity mode is vectorized too, and
property-tested equal to the Python assembler).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

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

# (term-rank bits + doc-rank bits) budget for the packed single-key
# sort in make_assemble_sorted_arrow; wider partitions take the
# two-pass uint32 radix composition. Module-level so tests can force
# the fallback on small corpora.
_PACK_BITS = 32


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


def _tokenize_ascii(texts: List[str], doc_ids: np.ndarray, ngrams: bool):
    """Vectorized tokenization of a list of ASCII strings — builds one
    byte buffer + doc bounds and defers to ``_tokenize_bytes``."""
    joined = "".join(texts)
    arr = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    doc_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    return _tokenize_bytes(arr, doc_starts, doc_ids, ngrams)


def _tokenize_bytes(
    arr: np.ndarray, doc_starts: np.ndarray, doc_ids: np.ndarray, ngrams: bool
):
    """Vectorized tokenization over a raw byte buffer of back-to-back
    ASCII docs -> flat occurrence arrays (terms: pa.StringArray, doc
    (actual ids), begin, end, pos (int32), full-or-None).

    Documents need no separators: every doc start forces a token-run
    break, so a run can never span two documents. This lets the kernels
    tokenize an arrow StringArray's values buffer IN PLACE (zero copy,
    no Python strings)."""
    al = _ASCII_AL_TAB[arr]
    ai = np.flatnonzero(al)
    if ai.size == 0:
        z = np.empty(0, np.int64)
        zi = np.empty(0, np.int32)
        return pa.array([], pa.utf8()), z, zi, zi, zi, None
    ws = _ASCII_WS_TAB[arr]
    nonws = ~ws
    run_start = nonws.copy()
    run_start[1:] &= ws[:-1]
    # force a new run at each doc boundary (no separator bytes needed)
    inb = doc_starts[doc_starts < arr.size]
    run_start[inb] = nonws[inb]
    # run id at each alnum char = cumulative run-start count. int32
    # accumulator: half the write traffic of the default int64 (a batch
    # can't hold 2^31 runs), and the per-batch buffer stays cache-sized
    rid = np.cumsum(run_start, dtype=np.int32)
    r = rid[ai]
    newtok = np.empty(ai.size, dtype=bool)
    newtok[0] = True
    np.not_equal(r[1:], r[:-1], out=newtok[1:])
    tok_start = np.flatnonzero(newtok)
    bounds = np.append(tok_start, ai.size)
    abs_begin = ai[tok_start]
    abs_end = ai[bounds[1:] - 1] + 1

    tok_doc = np.searchsorted(doc_starts, abs_begin, side="right") - 1
    rel_begin = (abs_begin - doc_starts[tok_doc]).astype(np.int32)
    rel_end = (abs_end - doc_starts[tok_doc]).astype(np.int32)
    # ordinal within doc, O(n): tok_doc is non-decreasing
    dstart = np.flatnonzero(
        np.concatenate(([True], tok_doc[1:] != tok_doc[:-1]))
    )
    first = np.repeat(dstart, np.diff(np.append(dstart, tok_doc.size)))
    pos = (np.arange(tok_doc.size) - first).astype(np.int32)

    clean = _LOWER[arr[ai]]

    if not ngrams:
        terms = pa.Array.from_buffers(
            pa.utf8(),
            tok_doc.size,
            [
                None,
                pa.py_buffer(bounds.astype(np.int32).tobytes()),
                pa.py_buffer(clean.tobytes()),
            ],
        )
        return terms, doc_ids[tok_doc], rel_begin, rel_end, pos, None

    tok_len = np.diff(bounds)
    n_out = int(tok_len.sum())
    occ_tok = np.repeat(np.arange(tok_len.size), tok_len)
    tok_off = np.concatenate(([0], np.cumsum(tok_len)))[:-1]
    plen = np.arange(n_out) - tok_off[occ_tok] + 1
    occ_begin = rel_begin[occ_tok]
    # ngram end counts ONLY kept term chars from begin (the reference's
    # finish accumulator, tokenizers.rs:222-239)
    occ_end = (occ_begin + plen).astype(np.int32)
    occ_full = plen == tok_len[occ_tok]
    out_off = np.concatenate(([0], np.cumsum(plen)))
    byte_src = np.repeat(bounds[occ_tok], plen) + (
        np.arange(out_off[-1]) - np.repeat(out_off[:-1], plen)
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
    return (
        terms,
        doc_ids[tok_doc][occ_tok],
        occ_begin,
        occ_end,
        pos[occ_tok],
        occ_full,
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
    terms, d, b, e, ppos, full = _tokenize_ascii(
        texts, np.asarray(doc_ids, np.int64), ngrams
    )
    if len(terms) == 0:
        return pa.RecordBatch.from_pydict(
            {c: [] for c in POSTINGS_ARROW_SCHEMA.names},
            schema=POSTINGS_ARROW_SCHEMA,
        )
    dict_arr = pc.dictionary_encode(terms)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary

    udocs = np.unique(d)
    keys = np.searchsorted(udocs, d) * len(vocab) + codes
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    grp_start = np.concatenate(([0], np.flatnonzero(sk[1:] != sk[:-1]) + 1))
    grp_bounds = np.append(grp_start, sk.size)
    ukeys = sk[grp_start]

    if full is None:
        tfs = np.diff(grp_bounds).astype(np.int32)
    else:
        tfs = np.add.reduceat(
            full[order].astype(np.int32), grp_bounds[:-1]
        ).astype(np.int32)

    positions = pa.ListArray.from_arrays(
        pa.array(grp_bounds, type=pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(b[order].astype(np.int32), type=pa.int32()),
                pa.array(e[order].astype(np.int32), type=pa.int32()),
                pa.array(ppos[order].astype(np.int32), type=pa.int32()),
            ],
            names=["begin", "end", "pos"],
        ),
    )
    return pa.RecordBatch.from_arrays(
        [
            pc.take(vocab, pa.array(ukeys % len(vocab))),
            pa.array(udocs[(ukeys // len(vocab))], type=pa.int64()),
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
    """Partition-sorting kernel: tokenize per batch, then group AND
    (term, doc_id)-sort the whole partition in one integer-key pass.

    Replaces the downstream ``sortWithinPartitions`` row sort. Tokens
    accumulate as flat columnar arrays; ONE dictionary encode over the
    partition maps terms to codes, vocab ranks give the term sort
    order, and a single stable argsort of ``rank * n_docs + doc``
    composite int64 keys produces the grouped rows directly in final
    file order — terms are compared as strings only once (inside the
    small vocab sort), never per row, and the positions lists are built
    already ordered so nothing is re-gathered afterwards. The JVM side
    is a straight arrow -> row -> parquet pipeline with no sort at all.

    Per-doc stat rows (term='') are emitted first — exactly where the
    (term, doc_id) sort would place them.
    """
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pa.set_cpu_count(1)  # never oversubscribe a task slot
        term_chunks: List[pa.Array] = []
        d_chunks: List[np.ndarray] = []
        b_chunks: List[np.ndarray] = []
        e_chunks: List[np.ndarray] = []
        p_chunks: List[np.ndarray] = []
        f_chunks: List[np.ndarray] = []
        sid_chunks: List[np.ndarray] = []
        slen_chunks: List[np.ndarray] = []
        fallback: List[pa.RecordBatch] = []

        def add(terms, d, b, e, p, full):
            if len(terms):
                term_chunks.append(terms)
                d_chunks.append(d)
                b_chunks.append(b)
                e_chunks.append(e)
                p_chunks.append(p)
                if full is not None:
                    f_chunks.append(full)

        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            sa = batch.column("text")
            if sa.null_count == 0 and sa.type == pa.string():
                # zero-copy fast path: tokenize the StringArray's values
                # buffer in place (doc starts force token-run breaks, so
                # no separators and no Python strings are ever made)
                bufs = sa.buffers()
                offs = np.frombuffer(bufs[1], np.int32)[
                    sa.offset : sa.offset + len(sa) + 1
                ].astype(np.int64)
                values = (
                    np.frombuffer(bufs[2], np.uint8)
                    if bufs[2] is not None
                    else np.empty(0, np.uint8)
                )
                view = values[offs[0] : offs[-1]]
                offs0 = offs - offs[0]
                if not (view >= 0x80).any():  # whole batch is ASCII
                    add(*_tokenize_bytes(
                        view, offs0[:-1], ids.astype(np.int64), ngrams
                    ))
                    sid_chunks.append(ids.astype(np.int64))
                    slen_chunks.append(np.diff(offs0))
                    continue
            # slow path: nulls or non-ASCII docs present in this batch
            texts = sa.to_pylist()
            ascii_texts: List[str] = []
            ascii_ids: List[int] = []
            other_texts: List[str] = []
            other_ids: List[int] = []
            for did, t in zip(ids, texts):
                if t is None:
                    continue
                if t.isascii():
                    ascii_texts.append(t)
                    ascii_ids.append(did)
                else:
                    other_texts.append(t)
                    other_ids.append(did)
            if ascii_texts:
                add(*_tokenize_ascii(
                    ascii_texts, np.asarray(ascii_ids, np.int64), ngrams
                ))
                sid_chunks.append(np.asarray(ascii_ids, np.int64))
                slen_chunks.append(
                    np.fromiter(
                        (len(t) for t in ascii_texts), np.int64,
                        count=len(ascii_texts),
                    )
                )
            if other_texts:
                fallback.append(
                    _assemble_fallback(other_texts, other_ids, ngrams)
                )
                sid_chunks.append(np.asarray(other_ids, np.int64))
                slen_chunks.append(
                    np.fromiter(
                        (len(t.encode("utf-8")) for t in other_texts),
                        np.int64, count=len(other_texts),
                    )
                )

        if sid_chunks:
            sid = np.concatenate(sid_chunks)
            slen = np.concatenate(slen_chunks)
            so = np.argsort(sid, kind="stable")
            yield _stat_batch(sid[so], slen[so])
        if not term_chunks and not fallback:
            return

        rows: Optional[pa.Table] = None
        if term_chunks:
            terms_all = pa.concat_arrays(term_chunks)
            dict_arr = pc.dictionary_encode(terms_all)
            # codes stay int32: half the gather/sort traffic of int64
            codes = dict_arr.indices.to_numpy(zero_copy_only=False)
            vocab = dict_arr.dictionary
            # term sort order via the (small) vocab, not per-row strings
            vorder = pc.sort_indices(vocab).to_numpy().astype(np.int64)
            rank = np.empty(len(vocab), np.uint32)
            rank[vorder] = np.arange(len(vocab), dtype=np.uint32)
            d = np.concatenate(d_chunks)
            # doc rank: hash-factorize (O(n), cache-resident table) +
            # sort only the small unique set — replaces np.unique's
            # full radix sort of `d` plus a per-row binary search
            import pandas as pd

            dcode64, uds = pd.factorize(d, sort=False)
            udorder = np.argsort(uds, kind="stable")
            drank = np.empty(uds.size, np.uint32)
            drank[udorder] = np.arange(uds.size, dtype=np.uint32)
            docidx = drank[dcode64]
            rk = rank[codes]
            # sort to (term rank, doc rank). numpy's stable argsort on
            # ints is a radix sort whose traffic scales with key width:
            # pack both ranks into ONE uint32 when their bits fit
            # (4 passes over 4-byte keys — ~2.7x less sort bandwidth
            # than the old int64 composite), else compose two stable
            # uint32 sorts (doc then term), still narrower than int64.
            vbits = max((len(vocab) - 1).bit_length(), 1)
            dbits = max((uds.size - 1).bit_length(), 1)
            if vbits + dbits <= _PACK_BITS:
                keys = (rk << np.uint32(dbits)) | docidx
                order = np.argsort(keys, kind="stable")
                sk = keys[order]
                new_grp = sk[1:] != sk[:-1]
            else:
                ord1 = np.argsort(docidx, kind="stable")
                order = ord1[np.argsort(rk[ord1], kind="stable")]
                rs_, ds_ = rk[order], docidx[order]
                new_grp = (rs_[1:] != rs_[:-1]) | (ds_[1:] != ds_[:-1])
            grp_start = np.concatenate(([0], np.flatnonzero(new_grp) + 1))
            grp_bounds = np.append(grp_start, order.size)
            # first row index of each group gives term code + doc id
            # directly — no modulo arithmetic over composite keys
            i0 = order[grp_start]
            if f_chunks:
                full = np.concatenate(f_chunks)
                tfs = np.add.reduceat(
                    full[order].astype(np.int32), grp_bounds[:-1]
                ).astype(np.int32)
            else:
                tfs = np.diff(grp_bounds).astype(np.int32)
            b = np.concatenate(b_chunks)[order].astype(np.int32)
            e = np.concatenate(e_chunks)[order].astype(np.int32)
            p = np.concatenate(p_chunks)[order].astype(np.int32)
            positions = pa.ListArray.from_arrays(
                pa.array(grp_bounds, type=pa.int32()),
                pa.StructArray.from_arrays(
                    [
                        pa.array(b, type=pa.int32()),
                        pa.array(e, type=pa.int32()),
                        pa.array(p, type=pa.int32()),
                    ],
                    names=["begin", "end", "pos"],
                ),
            )
            rows = pa.Table.from_arrays(
                [
                    pc.take(vocab, pa.array(codes[i0])),
                    pa.array(d[i0], type=pa.int64()),
                    positions,
                    pa.array(tfs, type=pa.int32()),
                ],
                schema=POSTINGS_ARROW_SCHEMA,
            )

        if fallback:
            # rare path: merge non-ASCII docs' grouped rows, then one
            # string sort over the combined (small relative to ascii)
            fb = pa.Table.from_batches(fallback, schema=POSTINGS_ARROW_SCHEMA)
            rows = pa.concat_tables([rows, fb]) if rows is not None else fb
            rows = rows.sort_by(
                [("term", "ascending"), ("doc_id", "ascending")]
            )

        for out in rows.to_batches(max_chunksize=65536):
            yield out

    return kernel


def make_write_index_arrow(ngrams: bool, path: str, resume: bool = False):
    """Kernel-direct index writer: the sorted-assembly kernel writes its
    partition's postings parquet, final docstats rows, AND per-partition
    termdict partial aggregates itself, returning one stats row.

    Skips the arrow->JVM IPC, the arrow->InternalRow conversion and the
    JVM parquet encoder entirely — the data is already columnar arrow in
    the worker, so pyarrow writes it straight out (same pattern as
    segments._write_shard). Because the doc layout keeps every doc's
    rows partition-local, docstats are FINAL per partition; only the
    tiny termdict partials (one row per distinct term per partition)
    need a downstream merge. Each file is written atomically via
    tmp+rename; retries/speculative duplicates produce identical bytes
    and the rename is idempotent.

    Per-partition checkpoint + lineage (north rule: builds resumable
    from per-partition checkpoints with per-task metrics): after its
    data files, each task atomically writes a ``build_tasks/
    part-<pid>.json`` sidecar recording what it wrote (file list) and
    its build metrics (docs, postings, bytes, elapsed, postings/sec).
    The sidecar is written LAST, so its existence certifies the
    partition's data files are complete. With ``resume=True`` a task
    whose sidecar (and every file it lists) already exists yields its
    recorded stats row and returns WITHOUT consuming its input — the
    corpus for that partition is never tokenized again. Partition ->
    content assignment is deterministic (hash repartition on doc_id
    with a fixed bucket count), so a resumed task's skipped work is
    exactly the work its predecessor completed; build_and_save guards
    the cross-run input-equality assumption with a corpus fingerprint.
    """
    import os

    sorted_kernel = make_assemble_sorted_arrow(ngrams)
    post_dir = os.path.join(path, "postings")
    ds_dir = os.path.join(path, "docstats")
    tp_dir = os.path.join(path, "termdict_partials")
    task_dir = os.path.join(path, "build_tasks")

    def _write(table: pa.Table, dirname: str, pid: int, **kw) -> None:
        import pyarrow.parquet as pq

        fname = os.path.join(dirname, f"part-{pid:05d}.parquet")
        tmp = fname + f".tmp-{os.getpid()}"
        pq.write_table(table, tmp, **kw)
        os.replace(tmp, fname)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import json
        import time

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sidecar = os.path.join(task_dir, f"part-{pid:05d}.json")
        if resume and os.path.exists(sidecar):
            with open(sidecar) as fh:
                prev = json.load(fh)
            if all(
                os.path.exists(os.path.join(path, rel))
                for rel in prev.get("files", ())
            ):
                # checkpoint hit: data files are complete (sidecar is
                # written last) — skip without consuming the input
                yield pa.RecordBatch.from_pydict(
                    {
                        "pid": pa.array([pid], pa.int32()),
                        "rows": pa.array([int(prev["rows"])], pa.int64()),
                    }
                )
                return
        t_start = time.perf_counter()
        out = list(sorted_kernel(batches))
        n = 0
        files: List[str] = []
        n_docs = n_postings = post_bytes = 0
        if out:
            table = pa.Table.from_batches(out, schema=POSTINGS_ARROW_SCHEMA)
            n = table.num_rows
            _write(table, post_dir, pid, row_group_size=1 << 20,
                   compression="snappy")
            part = f"part-{pid:05d}.parquet"
            files.append(f"postings/{part}")
            post_bytes = os.path.getsize(os.path.join(post_dir, part))

            term = table.column("term").combine_chunks()
            tf = table.column("tf").combine_chunks().to_numpy().astype(np.int64)
            doc = table.column("doc_id").combine_chunks().to_numpy()
            is_stat = pc.equal(term, "").to_numpy(zero_copy_only=False)
            k = int(is_stat.sum())
            # stat rows sort first (term '' < any real term) and the
            # kernel emits them first — the posting rows are the suffix
            assert k == 0 or bool(is_stat[:k].all())

            sdoc = doc[:k]
            sbytes = tf[:k]
            pdoc = doc[k:]
            ptf = tf[k:]
            ud = np.unique(pdoc)
            cnt = np.zeros(ud.size, dtype=np.int64)
            if pdoc.size:
                cnt = np.bincount(
                    np.searchsorted(ud, pdoc), weights=ptf, minlength=ud.size
                ).astype(np.int64)
            where = np.searchsorted(ud, sdoc)
            tok = np.zeros(sdoc.size, dtype=np.int64)
            hit = (where < ud.size)
            hit[hit] &= ud[where[hit]] == sdoc[hit]
            tok[hit] = cnt[where[hit]]
            _write(
                pa.table(
                    {
                        "doc_id": pa.array(sdoc, pa.int64()),
                        "doclen_bytes": pa.array(
                            sbytes.astype(np.int32), pa.int32()
                        ),
                        "doclen_tokens": pa.array(
                            tok.astype(np.int32), pa.int32()
                        ),
                    }
                ),
                ds_dir,
                pid,
            )
            files.append(f"docstats/{part}")
            n_docs = k
            n_postings = int(pdoc.size)

            if pdoc.size:
                d2 = pc.dictionary_encode(term.slice(k))
                codes = d2.indices.to_numpy(zero_copy_only=False)
                tstart = np.concatenate(
                    ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1)
                )
                df = np.diff(np.append(tstart, codes.size))
                cf = np.add.reduceat(ptf, tstart)
                df_full = np.add.reduceat((ptf > 0).astype(np.int64), tstart)
                _write(
                    pa.table(
                        {
                            "term": pc.take(
                                d2.dictionary, pa.array(codes[tstart])
                            ),
                            "df": pa.array(df.astype(np.int64), pa.int64()),
                            "df_full": pa.array(df_full, pa.int64()),
                            "cf": pa.array(cf, pa.int64()),
                        }
                    ),
                    tp_dir,
                    pid,
                )
                files.append(f"termdict_partials/{part}")
        if out:
            # sidecar last: lineage + per-task metrics, and the resume
            # checkpoint marker for this partition's data files
            elapsed = time.perf_counter() - t_start
            stats = {
                "pid": pid,
                "rows": n,
                "files": files,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "postings_bytes": post_bytes,
                "elapsed_sec": round(elapsed, 4),
                "postings_per_sec": round(n_postings / max(elapsed, 1e-9), 1),
            }
            tmp = sidecar + f".tmp-{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(stats, fh)
            os.replace(tmp, sidecar)
        yield pa.RecordBatch.from_pydict(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([n], pa.int64()),
            }
        )

    return kernel
