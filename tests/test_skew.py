"""Hot-term skew: the doc-sliced layout must keep partition/file sizes
uniform even when one term appears in EVERY document (the Zipf head that
would pin a term-partitioned build to one reducer)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.build import build_and_save
from inverted_index_spark.segments import build_segments


@pytest.fixture(scope="module")
def hot_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hotidx"))
    # 'the' in every doc (hot), plus a unique term per doc (cold tail)
    docs = spark.createDataFrame(
        [(i, f"the the the unique{i} word{i % 7}") for i in range(2000)],
        ["doc_id", "text"],
    )
    idx = build_and_save(spark, docs, path, ngrams=False, term_buckets=8)
    return path, idx


def test_postings_files_balanced_under_hot_term(hot_index):
    path, _ = hot_index
    sizes = sorted(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "postings", "part-*"))
    )
    assert len(sizes) >= 4
    # doc-sliced layout: the hot term spreads across every file; no file
    # should dwarf the median
    import statistics

    assert sizes[-1] <= 3 * statistics.median(sizes)


def test_hot_term_spread_across_files(spark, hot_index):
    path, idx = hot_index
    # rows of the hot term land in many distinct files, not one
    n_files = (
        idx.postings.filter(F.col("term") == "the")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert n_files >= 4


def test_segment_manifest_reports_skew(spark, hot_index):
    path, idx = hot_index
    manifest = build_segments(spark, idx, path, shard_docs=256)
    ratios = [s["skew_ratio"] for s in manifest["shards"]]
    counts = [s["n_postings"] for s in manifest["shards"]]
    # shards are uniform doc ranges -> posting counts near-equal even
    # with the hot term; within-shard term skew is *recorded*
    assert max(counts) <= 1.5 * (sum(counts) / len(counts))
    assert all(r >= 1.0 for r in ratios)
