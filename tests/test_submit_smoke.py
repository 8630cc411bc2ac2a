"""The spark-submit --py-files ship vector, proven cold (VERDICT r4 #7).

Runs scripts/submit_smoke.py: package zipped, build_job.py copied out
of the repo, spark-submit local[2] from a scratch cwd with PYTHONPATH
scrubbed — all imports must resolve from the shipped archive — then
asserts the metrics line and the segment manifest. One cold JVM,
~60-90 s; independent of the session-scoped test SparkSession.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)


def test_spark_submit_py_files_cold_start():
    from submit_smoke import N_DOCS, SHARD_DOCS, run_smoke

    m = run_smoke()
    assert m["n_docs"] == N_DOCS
    assert m["n_shards"] == (N_DOCS + SHARD_DOCS - 1) // SHARD_DOCS
    assert m["build_sec"] > 0
