"""Multi-format transcript sources round-trip through the same schema."""

import pytest

from inverted_index_spark.transcripts import (
    TRANSCRIPT_COLS,
    read_transcripts,
    synthetic_transcripts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_transcripts(spark, n_conversations=12, turns_per_conv=3)


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip(spark, tmp_path, corpus, fmt):
    path = str(tmp_path / fmt)
    writer = corpus.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss"
        )
    getattr(writer, fmt)(path)
    back = read_transcripts(spark, path, format=fmt)
    assert back.columns == TRANSCRIPT_COLS
    a = sorted(map(tuple, corpus.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_missing_columns_rejected(spark, tmp_path, corpus):
    path = str(tmp_path / "bad")
    corpus.drop("role").write.mode("overwrite").parquet(path)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, path)
