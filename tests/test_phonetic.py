"""Phonetic (Soundex) dictionary queries — engine extension (Lucene
phonetic-matching analog; the reference has no phonetic operator).

The load-bearing claim is oracle.soundex == Spark F.soundex exactly:
the relational plan filters the dictionary with F.soundex while the
segment planner expands driver-side with oracle.soundex, so any
divergence would split the two plans. Golden cases were captured from
Spark itself; the randomized sweep pins the rest.
"""

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.oracle import soundex
from inverted_index_spark.qast import And, Match, Phonetic
from tests.conftest import build_engine

# captured verbatim from Spark 4.1 F.soundex
SPARK_GOLDEN = {
    "robert": "R163", "rupert": "R163", "ashcraft": "A261",
    "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
    "honeyman": "H555", "a": "A000", "h": "H000", "w": "W000",
    "hw": "H000", "x1": "X000", "1abc": "1abc", "123": "123",
    "": "", "llama": "L500", "jackson": "J250", "washington": "W252",
    "lee": "L000", "aeiou": "A000", "bcd": "B230", "sgler": "S460",
    "czarkowska": "C622", "Ab": "A100", "aB": "A100", "HeLLo": "H400",
    "o'neil": "O540", "naïve": "N100", "café": "C100", "über": "über",
    "bhb": "B000", "bwb": "B000", "b'b": "B100", "b1b": "B100",
    "béb": "B100", "bb": "B000", "byb": "B100", "bab": "B100",
    # raw-ASCII first-char rule: chars that only full-Unicode-uppercase
    # into A-Z ('ß'->'SS', 'ſ'->'S', 'ﬁ'->'FI') do NOT qualify, and
    # mid-string they are separators, never coded
    "ßuber": "ßuber", "ſam": "ſam", "ﬁsh": "ﬁsh", "ĳs": "ĳs",
    "bßb": "B100", "bſb": "B100", "bﬁb": "B100", "bĳb": "B100",
}


def test_soundex_golden():
    for s, want in SPARK_GOLDEN.items():
        assert soundex(s) == want, s


def test_soundex_matches_spark_randomized(spark):
    import random

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyzAEIOUYHW'1-éü"
    cases = list(SPARK_GOLDEN) + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s", F.soundex("s").alias("sx")
    )
    for r in df.collect():
        assert soundex(r["s"]) == r["sx"], repr(r["s"])


DOCS = [
    (0, "robert likes scala"),
    (1, "rupert reads rows"),
    (2, "roberta writes docs"),
    (3, "bob sleeps well"),
    (4, "rapid river rafting"),
    (5, "rubber duck debugging"),
]


@pytest.fixture(scope="module")
def eng(spark):
    return build_engine(spark, DOCS, ngrams=False)


def test_phonetic_membership(eng):
    # robert/rupert/roberta/rubber are all R163; bob B100, rapid R130
    got = sorted(r["doc_id"] for r in eng.results(Phonetic("rupert")).collect())
    assert got == [0, 1, 2]
    # rubber is R160 (the double-b collapses), NOT R163 like
    # robert/rupert/roberta — a true negative inside the r-band
    assert soundex("rubber") == "R160"
    assert soundex("rupert") == soundex("roberta") == "R163"
    # composes with the algebra
    both = sorted(
        r["doc_id"]
        for r in eng.results(And(Phonetic("rupert"), Match("scala"))).collect()
    )
    assert both == [0]


def test_phonetic_cap_takes_highest_df(spark):
    # 'bat' appears in 3 docs, 'bet' in 1 -> cap=1 keeps 'bat'
    docs = [(0, "bat"), (1, "bat x"), (2, "bat y"), (3, "bet")]
    e = build_engine(spark, docs, ngrams=False)
    capped = sorted(
        r["doc_id"]
        for r in e.results(Phonetic("bit", max_expansions=1)).collect()
    )
    assert capped == [0, 1, 2]
    full = sorted(
        r["doc_id"] for r in e.results(Phonetic("bit")).collect()
    )
    assert full == [0, 1, 2, 3]


def test_phonetic_validation(spark, eng):
    with pytest.raises(ValueError, match="exactly one analyzed term"):
        eng.results(Phonetic("two words"))
    ngram_eng = build_engine(spark, DOCS[:2], ngrams=True)
    with pytest.raises(ValueError, match="full-token index"):
        ngram_eng.results(Phonetic("robert"))


def test_phonetic_multichar_uppercase_first_char(eng):
    """'ß'.upper() == 'SS' used to slip past the A..Z band check and
    crash chr(ord(...)+1); it must behave like any other
    non-ASCII-letter-initial query (code = raw string, exact-term
    lookup, empty here)."""
    assert eng.results(Phonetic("ßuber")).count() == 0
    assert eng.results(Phonetic("ſam")).count() == 0


def test_phonetic_segment_twin_bit_identical(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segquery import segment_query
    from inverted_index_spark import metacache

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    path = str(tmp_path / "idx")
    idx = build_and_save(spark, df, path, ngrams=False)
    build_segments(spark, idx, path, positions=True)
    e = FtsEngine(idx)
    rel = e.results(Phonetic("rupert")).collect()
    seg = segment_query(
        spark, path, Phonetic("rupert"), mode="spark"
    ).orderBy("doc_id").collect()
    rel = sorted(rel, key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rel] == [r["doc_id"] for r in seg]
    for a, b in zip(rel, seg):
        assert a["score"] == b["score"]
        assert [tuple(p) for p in a["positions"]] == [
            tuple(p) for p in b["positions"]
        ]
    # driver-side expansion == relational expansion (cap contract)
    exp = metacache.phonetic_terms(path, "rupert", 50)
    assert exp == ["robert", "roberta", "rupert"]
    # bm25 over the phonetic term bag (WAND-eligible term-bag query)
    ranked = e.bm25_query(Phonetic("rupert"), k=10).collect()
    assert {r["doc_id"] for r in ranked} == {0, 1, 2}


def test_phonetic_three_evaluator_identity(eng):
    """Relational engine == pure-Python OracleIndex (the segment twin
    is pinned separately): doc set, positions and parity score."""
    from inverted_index_spark.oracle import OracleIndex

    oracle = OracleIndex()
    for doc_id, text in DOCS:
        oracle.add(doc_id, text)
    for q in (Phonetic("rupert"), Phonetic("bob"), Phonetic("rapid"),
              Phonetic("zzz")):
        expect = [
            (r.doc_id, [tuple(p) for p in r.positions], round(r.score, 5))
            for r in oracle.query(q)
        ]
        got = sorted(
            (
                r["doc_id"],
                [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
                round(r["score"], 5),
            )
            for r in eng.results(q).collect()
        )
        assert got == sorted(expect), q
