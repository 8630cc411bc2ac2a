"""Vectorized tokenizer + Arrow posting assembly: exact equivalence with
the reference-semantics Python paths."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from inverted_index_spark.analysis import (
    english_utf8_tokenize,
    english_utf8_tokenize_fast,
)
from inverted_index_spark.arrow_build import assemble_postings_arrow
from inverted_index_spark.udfs import _analyze_one

CASES = [
    "",
    " ",
    "a",
    "...",
    "Hi, Dave! How are you?",
    "a..b c",
    "  x  ",
    "Won't stop won't",
    "tab\there\nnewline\x0bvtab",
    "end.",
    ".start",
    "mixé utf ñ",
    "嗨 您好",
    "İstanbul is big",
    "1a2b 3C4D",
]


@pytest.mark.parametrize("text", CASES)
def test_fast_tokenizer_equals_exact(text):
    assert english_utf8_tokenize_fast(text) == english_utf8_tokenize(text)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_fast_tokenizer_property(text):
    assert english_utf8_tokenize_fast(text) == english_utf8_tokenize(text)


def _python_assemble(doc_id, text):
    per = {}
    for term, b, e, p, full in _analyze_one(text, False):
        per.setdefault(term, []).append((b, e, p))
    return {
        (term, doc_id): (sorted(pl), len(pl)) for term, pl in per.items()
    }


def _arrow_assemble(texts):
    batch = pa.RecordBatch.from_pydict(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = {}
    for out in assemble_postings_arrow(iter([batch])):
        d = out.to_pydict()
        for term, doc, pl, tf in zip(
            d["term"], d["doc_id"], d["positions"], d["tf"]
        ):
            if term == "":  # per-doc stat rows, asserted separately
                continue
            got[(term, doc)] = (
                [(q["begin"], q["end"], q["pos"]) for q in pl],
                tf,
            )
    return got


def test_stat_rows_carry_byte_lengths():
    texts = ["hello world", "嗨 您好", ""]
    batch = pa.RecordBatch.from_pydict(
        {"doc_id": np.arange(3, dtype=np.int64), "text": texts}
    )
    stats = {}
    for out in assemble_postings_arrow(iter([batch])):
        d = out.to_pydict()
        for term, doc, pl, tf in zip(
            d["term"], d["doc_id"], d["positions"], d["tf"]
        ):
            if term == "":
                stats[doc] = (tf, pl)
    assert stats[0] == (11, [])
    assert stats[1] == (len("嗨 您好".encode()), [])
    assert stats[2] == (0, [])


def test_arrow_assembly_matches_python():
    texts = CASES + ["batch batch batch", "is is is", "the quick brown fox"]
    expect = {}
    for i, t in enumerate(texts):
        expect.update(_python_assemble(i, t))
    assert _arrow_assemble(texts) == expect


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
def test_arrow_assembly_property(texts):
    expect = {}
    for i, t in enumerate(texts):
        expect.update(_python_assemble(i, t))
    assert _arrow_assemble(texts) == expect


def test_mixed_ascii_and_unicode_batch():
    texts = ["plain ascii here", "嗨 您好 unicode doc", "more ascii"]
    expect = {}
    for i, t in enumerate(texts):
        expect.update(_python_assemble(i, t))
    assert _arrow_assemble(texts) == expect


def _python_assemble_ngrams(doc_id, text):
    per = {}
    for term, b, e, p, full in _analyze_one(text, True):
        ent = per.setdefault(term, [[], 0])
        ent[0].append((b, e, p))
        if full:
            ent[1] += 1
    return {
        (term, doc_id): (sorted(pl), tf) for term, (pl, tf) in per.items()
    }


def _arrow_assemble_ngrams(texts):
    from inverted_index_spark.arrow_build import make_assemble_postings_arrow

    batch = pa.RecordBatch.from_pydict(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = {}
    for out in make_assemble_postings_arrow(True)(iter([batch])):
        d = out.to_pydict()
        for term, doc, pl, tf in zip(
            d["term"], d["doc_id"], d["positions"], d["tf"]
        ):
            if term == "":
                continue
            got[(term, doc)] = (
                [(q["begin"], q["end"], q["pos"]) for q in pl],
                tf,
            )
    return got


def test_arrow_ngram_assembly_matches_python():
    texts = CASES + ["batch batch batch", "a,b interior", "aaa aa a"]
    expect = {}
    for i, t in enumerate(texts):
        expect.update(_python_assemble_ngrams(i, t))
    assert _arrow_assemble_ngrams(texts) == expect


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
def test_arrow_ngram_assembly_property(texts):
    expect = {}
    for i, t in enumerate(texts):
        expect.update(_python_assemble_ngrams(i, t))
    assert _arrow_assemble_ngrams(texts) == expect


@pytest.mark.parametrize("ngrams", [False, True])
def test_sorted_kernel_matches_per_batch_kernel(ngrams):
    from inverted_index_spark.arrow_build import (
        make_assemble_postings_arrow,
        make_assemble_sorted_arrow,
    )

    texts = CASES + ["batch batch batch", "zz aa mm", "aa zz"]
    batches = [
        pa.RecordBatch.from_pydict(
            {
                "doc_id": np.arange(i, i + len(texts[i : i + 5]), dtype=np.int64),
                "text": texts[i : i + 5],
            }
        )
        for i in range(0, len(texts), 5)
    ]

    def rowset(out):
        rows = set()
        for rb in out:
            d = rb.to_pydict()
            for t, doc, pl, tf in zip(
                d["term"], d["doc_id"], d["positions"], d["tf"]
            ):
                rows.add(
                    (t, doc, tuple((q["begin"], q["end"], q["pos"]) for q in pl), tf)
                )
        return rows

    plain = rowset(make_assemble_postings_arrow(ngrams)(iter(batches)))
    srt = list(make_assemble_sorted_arrow(ngrams)(iter(batches)))
    assert rowset(srt) == plain
    # and the emitted order is (term, doc_id) ascending with '' first
    flat = []
    for rb in srt:
        d = rb.to_pydict()
        flat += list(zip(d["term"], d["doc_id"]))
    assert flat == sorted(flat)


def test_sorted_kernel_mixed_unicode_partition():
    from inverted_index_spark.arrow_build import (
        make_assemble_postings_arrow,
        make_assemble_sorted_arrow,
    )

    texts = ["plain ascii here", "嗨 您好 unicode doc", "zebra apple", "ñandú mix"]
    batch = pa.RecordBatch.from_pydict(
        {"doc_id": np.arange(4, dtype=np.int64), "text": texts}
    )

    def rowset(out):
        rows = set()
        for rb in out:
            d = rb.to_pydict()
            for t, doc, pl, tf in zip(
                d["term"], d["doc_id"], d["positions"], d["tf"]
            ):
                rows.add(
                    (t, doc, tuple((q["begin"], q["end"], q["pos"]) for q in pl), tf)
                )
        return rows

    srt = list(make_assemble_sorted_arrow(False)(iter([batch])))
    assert rowset(srt) == rowset(
        make_assemble_postings_arrow(False)(iter([batch]))
    )
    flat = []
    for rb in srt:
        d = rb.to_pydict()
        flat += list(zip(d["term"], d["doc_id"]))
    # stats first, then term-sorted (fallback merge path)
    assert flat == sorted(flat)


def test_direct_write_gated_on_shared_fs(spark, tmp_path, monkeypatch):
    """Kernel-direct writes require driver+executors to share the target
    filesystem (round-3 advice): with SPARK_GRAFT_SHARED_FS=0 the build
    must take the driver-coordinated JVM writer path and still produce
    an identical index."""
    import os

    from pyspark.sql import functions as F

    from inverted_index_spark.build import build_and_save

    docs = spark.createDataFrame(
        [(i, f"alpha w{i % 7} beta gamma{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    p_direct = str(tmp_path / "direct")
    p_jvm = str(tmp_path / "jvm")
    monkeypatch.setenv("SPARK_GRAFT_SHARED_FS", "1")
    build_and_save(spark, docs, p_direct, ngrams=False, store_docs=False)
    monkeypatch.setenv("SPARK_GRAFT_SHARED_FS", "0")
    build_and_save(spark, docs, p_jvm, ngrams=False, store_docs=False)
    # fallback path leaves no kernel-written partials behind
    assert not os.path.isdir(os.path.join(p_jvm, "termdict_partials"))

    def canon(path, table):
        df = spark.read.parquet(os.path.join(path, table))
        if "positions" in df.columns:
            df = df.withColumn("np", F.size("positions")).drop("positions")
        return sorted(tuple(r) for r in df.collect())

    for t in ("postings", "docstats", "termdict"):
        assert canon(p_direct, t) == canon(p_jvm, t), t


def test_sorted_kernel_two_pass_fallback(monkeypatch):
    """Wide partitions (term-rank bits + doc-rank bits > _PACK_BITS)
    compose two stable uint32 radix sorts instead of one packed key;
    forcing the fallback on a small corpus must leave the output
    byte-identical to the packed path and the per-batch kernel."""
    import inverted_index_spark.arrow_build as ab

    texts = CASES + ["batch batch batch", "zz aa mm", "aa zz", "b a c a b"]
    batches = [
        pa.RecordBatch.from_pydict(
            {
                "doc_id": np.arange(i, i + len(texts[i : i + 3]), dtype=np.int64),
                "text": texts[i : i + 3],
            }
        )
        for i in range(0, len(texts), 3)
    ]

    def dump(out):
        rows = []
        for rb in out:
            d = rb.to_pydict()
            rows += list(zip(
                d["term"], d["doc_id"],
                [tuple((q["begin"], q["end"], q["pos"]) for q in pl)
                 for pl in d["positions"]],
                d["tf"],
            ))
        return rows

    packed = dump(ab.make_assemble_sorted_arrow(False)(iter(batches)))
    monkeypatch.setattr(ab, "_PACK_BITS", 1)  # force the two-pass path
    fallback = dump(ab.make_assemble_sorted_arrow(False)(iter(batches)))
    assert fallback == packed
    assert fallback == sorted(fallback, key=lambda r: (r[0], r[1]))
