"""The __spark_entry__ contract surface: every query has an oracle, and
the queries() insertion order keeps the driver-gate window invariant.

The external driver's per-round correctness gate records only the
first ~50 entries in insertion order (round 3 recorded keys 1-50 of
71), so ordering is load-bearing: the entries no driver round has yet
verified must sit inside the window. scripts/check_contract.py is
order-independent and would never catch a silent reshuffle — this test
pins the invariant instead.
"""

import importlib.util
import sys

DRIVER_WINDOW = 50

# the 23 contracts never driver-recorded through round 4 (absent from
# CORRECTNESS_r01..r04); each needs a CORRECTNESS_r05 row, so each must
# sit inside the round-5 driver window, plus any round-5 additions
NEED_WINDOW = {
    # round-4 stragglers (judge-verified green, never driver-recorded)
    "audio_features", "hybrid_weighted", "phonetic_seg", "at_least_seg",
    "regex_seg", "delete_by_query", "span_first", "tool_transitions",
    "tool_usage", "kmv_distinct", "quantiles", "heavy_hitters",
    "rank_eval", "cooccurrence", "changelog", "line_dedup", "lm_score",
    "top_hits", "kmeans", "redact", "tfidf_vec", "span_dedup",
    "temp_mix",
    # round-5 additions
    "span_max", "quantiles_approx", "bloom_contamination",
    "domain_stats", "group_sample",
}


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_under_test", mod)
    spec.loader.exec_module(mod)
    return mod


def test_every_query_has_an_oracle():
    m = _entry()
    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q), "oracle entries without a query"
    assert set(q) == set(o), (
        "rows-only contracts appeared; if intentional, update this test "
        f"with the exception list: {sorted(set(q) - set(o))}"
    )


def test_never_checked_contracts_inside_driver_window():
    m = _entry()
    keys = list(m.queries())
    assert len(keys) == len(set(keys))
    window = set(keys[:DRIVER_WINDOW])
    missing = NEED_WINDOW - window
    assert not missing, (
        f"contracts the driver gate has never recorded fell outside the "
        f"first {DRIVER_WINDOW} queries() entries: {sorted(missing)} — "
        "reorder queries() (insertion order is the gate order)"
    )
