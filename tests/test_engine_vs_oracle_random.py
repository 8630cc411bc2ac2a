"""Randomized cross-check: the Spark engine vs the pure-Python oracle
(SURVEY §5.2) on seeded random corpora — doc sets, byte-offset
positions, parity scores, and rank order must all agree for every query
shape (Match / And / Or / Phrase / Prefix)."""

import random
import re

import pytest

from inverted_index_spark.oracle import OracleIndex
from inverted_index_spark.qast import (
    And,
    AndNot,
    AtLeast,
    Match,
    Near,
    Or,
    Phrase,
    Prefix,
    Regex,
    Wildcard,
)
from tests.conftest import build_engine

WORDS = [
    "scan", "merge", "join", "Won't", "İstanbul", "a", "bb", "ccc",
    "data2", "x9", "嗨", "您好", "mixé", "UPPER", "lower", "scan",
]
PUNCT = ["", ",", "!", "...", "?"]


def _corpus(seed: int, n_docs: int = 18):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        words = [
            rng.choice(WORDS) + rng.choice(PUNCT)
            for _ in range(rng.randint(0, 10))
        ]
        docs.append((i, " ".join(words)))
    return docs


def _queries(seed: int):
    rng = random.Random(seed + 1000)
    qs = []
    for _ in range(4):
        t1, t2 = rng.choice(WORDS).lower(), rng.choice(WORDS).lower()
        qs.extend(
            [
                Match(t1),
                Match(f"{t1} {t2}"),
                And(Match(t1), Match(t2)),
                Or(Match(t1), Match(t2)),
                Phrase(f"{t1} {t2}"),
                Prefix(t1[: max(1, len(t1) - 1)]),
                And(Or(Match(t1), Phrase(f"{t2} {t1}")), Match(t2)),
                AndNot(Match(t1), Match(t2)),
                AndNot(Or(Match(t1), Match(t2)), Phrase(f"{t1} {t2}")),
                AndNot(Match(t1), Prefix(t2[: max(1, len(t2) - 1)])),
                Near(f"{t1} {t2}", rng.randint(1, 4)),
                And(Near(f"{t1} {t2}", 2), Match(t2)),
                Or(Near(f"{t2} {t1}", 3), Phrase(f"{t1} {t2}")),
                AndNot(Match(t1), Near(f"{t1} {t2}", 4)),
                Wildcard(f"{t1[:1]}*{t1[-1:]}"),
                Wildcard(("?" + t1[1:]) if len(t1) > 1 else "?"),
                And(Wildcard(f"*{t2[-1:]}"), Match(t1)),
                # raw dictionary regex (engine extension): alternation
                # of exact terms, class head + dot-star tail, optional
                # quantifier, and composition with the boolean algebra
                # (WORDS are alphanumeric after analysis — no escaping
                # needed inside the dialect-stable subset)
                Regex(f"{re.escape(t1)}|{re.escape(t2)}"),
                Regex(f"[{t1[:1]}{t2[:1]}].*"
                      if t1[:1] != t2[:1] else f"{re.escape(t1[:1])}.*"),
                Regex(f"{re.escape(t1)}s?"),
                And(Regex(f"{re.escape(t1)}|{re.escape(t2)}"), Match(t2)),
                AndNot(Match(t1), Regex(f"{re.escape(t2[:1])}.*")),
                # minimum-should-match: the general 1 < m < n shape,
                # with Phrase children (zero-hit membership quirk must
                # count as a vote) and nested composition both ways
                AtLeast(2, Match(t1), Match(t2), Phrase(f"{t1} {t2}")),
                AtLeast(
                    2, Match(t1), Near(f"{t1} {t2}", 2), Prefix(t1[:1])
                ),
                AtLeast(
                    3,
                    Match(t1),
                    Match(t2),
                    Or(Match(t1), Match(t2)),
                    Phrase(f"{t2} {t1}"),
                ),
                AndNot(
                    AtLeast(2, Match(t1), Match(t2), Prefix(t2[:1])),
                    Phrase(f"{t1} {t2}"),
                ),
                And(AtLeast(2, Match(t1), Match(t2), Match("scan")), Match(t1)),
            ]
        )
    return qs


@pytest.mark.parametrize("seed", [7, 21])
def test_random_corpus_parity(spark, seed):
    docs = _corpus(seed)
    eng = build_engine(spark, docs, ngrams=True)
    oracle = OracleIndex()
    for doc_id, text in docs:
        oracle.add(doc_id, text)

    for q in _queries(seed):
        expect = [
            (r.doc_id, [tuple(p) for p in r.positions], round(r.score, 5))
            for r in oracle.query(q)
        ]
        got = [
            (
                r["doc_id"],
                [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
                round(r["score"], 5),
            )
            for r in eng.results(q).collect()
        ]
        assert got == expect, f"query {q} diverged on seed {seed}"


@pytest.mark.parametrize("seed", [7, 21])
def test_random_corpus_segment_parity(spark, seed, tmp_path):
    """The SCALE path under the same fuzz: random unicode corpus ->
    kernel-direct build -> positional compressed segments ->
    ``segment_query`` must agree with the pure-Python oracle on every
    random query shape (doc sets, byte positions, rounded scores, rank
    order). Exercises the whole codec chain (delta/varint encode ->
    block decode -> numpy kernels) that test_segments_wand.py pins only
    on a fixed corpus."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import (
        segment_query,
        segment_query_pandas,
    )

    docs = _corpus(seed, n_docs=40)
    path = str(tmp_path / "randseg")
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=True, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=16, block_docs=8,
                   positions=True)
    oracle = OracleIndex()
    for doc_id, text in docs:
        oracle.add(doc_id, text)

    for q in _queries(seed):
        expect = [
            (r.doc_id, [tuple(p) for p in r.positions], round(r.score, 5))
            for r in oracle.query(q)
        ]
        got = [
            (
                r["doc_id"],
                [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
                round(r["score"], 5),
            )
            for r in segment_query(
                spark, path, q, with_positions=True, mode="spark"
            ).collect()
        ]
        assert got == expect, f"segment query {q} diverged on seed {seed}"

        # the query-node (no-Spark) serving path under the same fuzz
        pdf = segment_query_pandas(path, q, with_positions=True)
        served = [
            (
                int(d),
                [(p["begin"], p["end"], p["pos"]) for p in poss],
                round(float(s), 5),
            )
            for d, s, poss in zip(
                pdf["doc_id"], pdf["score"], pdf["positions"]
            )
        ]
        assert served == expect, f"pandas serving {q} diverged on seed {seed}"

        # doc_range window under the same fuzz: the oracle expectation
        # is simply the unrestricted answer filtered to [lo, hi)
        lo, hi = 8, 31  # straddles shard boundaries (shard_docs=16)
        want_rng = [r for r in expect if lo <= r[0] < hi]
        pdf_rng = segment_query_pandas(
            path, q, with_positions=True, doc_range=(lo, hi)
        )
        got_rng = [
            (
                int(d),
                [(p["begin"], p["end"], p["pos"]) for p in poss],
                round(float(s), 5),
            )
            for d, s, poss in zip(
                pdf_rng["doc_id"], pdf_rng["score"], pdf_rng["positions"]
            )
        ]
        assert got_rng == want_rng, f"doc_range {q} diverged on seed {seed}"
