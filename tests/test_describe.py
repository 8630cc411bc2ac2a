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


def test_engine_explain_routing(spark, tmp_path):
    """FtsEngine.explain: zero-job routing preview — segments when
    fresh, relational when stale/pinned/filtered, string queries parsed."""
    from inverted_index_spark.build import load_index
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.upsert import upsert_saved

    path = str(tmp_path / "idx4")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    eng = FtsEngine(idx)
    e0 = eng.explain("alpha AND NOT w1")
    assert e0["route"] == "relational" and "stale" in e0["reason"]

    build_segments(spark, idx, path, shard_docs=16, positions=True)
    e1 = FtsEngine(load_index(spark, path)).explain("alpha AND NOT w1")
    assert e1["route"] == "segments"
    assert e1["shards_open"] >= 1 and e1["serving"] in ("local", "spark")
    assert "AndNot" in e1["tree"]

    # pinned relational / filtered preview
    eng2 = FtsEngine(load_index(spark, path), use_segments=False)
    assert eng2.explain("alpha")["route"] == "relational"
    assert eng2.explain("alpha", filtered=True)["route"] == "relational"

    # mutation flips the route back
    upsert_saved(
        spark, path,
        spark.createDataFrame([(0, "gamma")], "doc_id long, text string"),
    )
    e2 = FtsEngine(load_index(spark, path)).explain("alpha")
    assert e2["route"] == "relational"
