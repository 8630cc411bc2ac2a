"""describe_index: zero-job operational snapshot of a saved index."""

from inverted_index_spark.build import build_and_save
from inverted_index_spark.describe import describe_index
from inverted_index_spark.segments import build_segments


def test_describe_reports_tables_segments_and_build(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(100)
    docs.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    docs = spark.read.parquet(str(tmp_path / "corpus"))
    idx = build_and_save(spark, docs, path, ngrams=False, store_docs=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8,
                   positions=True)

    d = describe_index(path)
    assert d["meta"]["n_docs"] == 100 and d["meta"]["ngrams"] is False
    for t in ("postings", "docstats", "termdict"):
        assert d["tables"][t]["files"] > 0 and d["tables"][t]["bytes"] > 0
    assert "docs" not in d["tables"]  # store_docs=False
    assert d["segments"]["fresh"] and d["segments"]["positional"]
    assert d["segments"]["shards"] >= 3
    assert d["segments"]["compression"] > 1
    assert d["build"]["n_tasks"] >= 1 and d["build"]["resumed_tasks"] == 0
    assert d["build"]["total_docs"] == 100
    assert d["build"]["skew_ratio"] >= 1
    assert d["stream_delta_batches"] == {}


def test_describe_flags_staleness_after_mutation(spark, tmp_path):
    from pyspark.sql import Row

    from inverted_index_spark.upsert import upsert_saved

    path = str(tmp_path / "idx2")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(60)
    idx = build_and_save(spark, docs, path, ngrams=False, store_docs=True)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8,
                   positions=True)
    assert describe_index(path)["segments"]["fresh"]

    upsert_saved(
        spark,
        path,
        spark.createDataFrame([Row(doc_id=0, text="fresh new words")]),
    )
    d = describe_index(path)
    assert not d["segments"]["fresh"], "upsert must flip segments stale"
    assert d["segments"].get("pending_refresh_shards"), (
        "the touched shard must be queued for incremental refresh"
    )
    assert d["versioned_dirs"], "upsert publishes catalog-versioned dirs"


def test_describe_reports_mutation_generations(spark, tmp_path):
    from inverted_index_spark.upsert import delete_saved, upsert_saved

    path = str(tmp_path / "idx3")
    docs = spark.createDataFrame(
        [(i, f"alpha w{i}") for i in range(20)], "doc_id long, text string"
    )
    build_and_save(spark, docs, path, ngrams=False)
    assert describe_index(path)["mutation_generations"] == {}

    upsert_saved(
        spark, path,
        spark.createDataFrame([(0, "alpha changed")],
                              "doc_id long, text string"),
    )
    delete_saved(
        spark, path, spark.createDataFrame([(1,)], "doc_id long")
    )
    m = describe_index(path)["mutation_generations"]
    assert m["postings_delta"] == ["gen=1"]
    # gen=2 is a tombstone-ONLY generation (the pure delete)
    assert m["tombstones"] == ["gen=1", "gen=2"]
