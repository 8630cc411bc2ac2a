"""Golden tests for the analyzer, ported from the reference test-suite.

Expected values are the hard-coded assertions in
/root/reference/src/tokenizers.rs:304-315 and src/index.rs:159-407.
"""

from inverted_index_spark.analysis import (
    Token,
    analyze_index,
    analyze_query,
    english_utf8_tokenize,
)


def test_tiny_buffer():
    # tokenizers.rs:304-315
    toks = english_utf8_tokenize("Hi, Dave! How are you?")
    assert toks == [
        Token("Hi", 0, 2, 0),
        Token("Dave", 4, 8, 1),
        Token("How", 10, 13, 2),
        Token("are", 14, 17, 3),
        Token("you", 18, 21, 4),
    ]


def test_punctuation_inside_token():
    # index.rs:196-206: "Won\u{2019}t" tokenizes to one token "Wont"
    toks = english_utf8_tokenize("Won’t this")
    assert toks[0].term == "Wont"
    assert (toks[0].begin, toks[0].end) == (0, 7)  # apostrophe is 3 bytes
    assert toks[1] == Token("this", 8, 12, 1)


def test_unicode_byte_offsets():
    # index.rs:208-218: byte offsets slice the UTF-8 encoding
    toks = english_utf8_tokenize("嗨, 您好")
    raw = "嗨, 您好".encode("utf-8")
    assert [t.term for t in toks] == ["嗨", "您好"]
    for t in toks:
        assert raw[t.begin : t.end].decode("utf-8") == t.term


def test_edge_ngrams_offsets():
    # tokenizers.rs:222-239: each prefix spans (start, start+utf8len(prefix))
    ngrams = analyze_index("program")
    assert [(t.term, t.begin, t.end, t.pos) for t in ngrams] == [
        ("p", 0, 1, 0),
        ("pr", 0, 2, 0),
        ("pro", 0, 3, 0),
        ("prog", 0, 4, 0),
        ("progr", 0, 5, 0),
        ("progra", 0, 6, 0),
        ("program", 0, 7, 0),
    ]


def test_char_len_change():
    # index.rs:399-406: 'İ' lowercases to 2 chars / 3 bytes ('i' + U+0307),
    # but offsets still cover the source bytes (0, 4) for "İİ"
    ngrams = analyze_index("İİ")
    full = [t for t in ngrams if t.term == "i̇i̇"]
    assert full and full[0].end == 4


def test_query_analyzer_no_ngrams():
    toks = analyze_query("Learn To")
    assert [(t.term, t.begin, t.end, t.pos) for t in toks] == [
        ("learn", 0, 5, 0),
        ("to", 6, 8, 1),
    ]


def test_ngram_of_punctuated_token_end_offsets():
    # NgramsFilter computes prefix ends over the *cleaned* token chars
    # (tokenizers.rs:224-235), so "Won’t" prefixes end at start+len(prefix)
    ngrams = analyze_index("Won’t")
    by_term = {t.term: t for t in ngrams}
    assert by_term["won"].end == 3
    # full token "wont": 4 chars -> end 4, NOT 7 (punctuation bytes skipped)
    assert by_term["wont"].end == 4


def test_empty_and_whitespace_only():
    assert english_utf8_tokenize("") == []
    assert english_utf8_tokenize(" \t\n  ") == []
    assert english_utf8_tokenize("!!! ...") == []
