import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.appName("fts-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def build_engine(spark, docs, ngrams=True):
    """docs: list of (doc_id, text) -> FtsEngine over a fresh index."""
    from inverted_index_spark.build import build_index
    from inverted_index_spark.query import FtsEngine

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return FtsEngine(build_index(spark, df, ngrams=ngrams, term_buckets=4))
