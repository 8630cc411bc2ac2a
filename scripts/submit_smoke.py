"""Cold-start proof of the ``spark-submit --py-files`` ship vector.

The deployment shape ``scripts/build_job.py`` documents is only real if
it works with NOTHING on the Python path but the shipped zip. This
script stages exactly that:

1. zip ``inverted_index_spark/`` (the ``python -m zipfile`` step from
   the build_job docstring, via shutil.make_archive);
2. copy ``build_job.py`` OUT of the repo into a scratch dir, so its
   own ``sys.path`` bootstrap points at a tree with no package in it;
3. run ``spark-submit --master local[2] --py-files <zip>`` from the
   scratch cwd with ``PYTHONPATH`` scrubbed — every
   ``inverted_index_spark`` import must resolve from the archive, on
   the driver and in the executors' Python workers;
4. assert the job's JSON metrics line and the written index: doc
   count, docstats/postings dirs, and the segment ``manifest.json``
   with one entry per doc-range shard.

Run directly (``python scripts/submit_smoke.py``) or via
``tests/test_submit_smoke.py``. Takes ~60-90 s (one cold JVM).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

DOCS = os.environ.get(
    "SMOKE_DOCS", "/root/testdata/sf0.001/documents.parquet"
)
N_DOCS = 60
SHARD_DOCS = 32  # 60 docs -> 2 shards


def run_smoke(verbose: bool = False) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        zip_path = shutil.make_archive(
            os.path.join(work, "inverted_index_spark"),
            "zip",
            root_dir=repo,
            base_dir="inverted_index_spark",
        )
        jobdir = os.path.join(work, "scripts")
        os.makedirs(jobdir)
        shutil.copy(os.path.join(repo, "scripts", "build_job.py"), jobdir)

        import pyarrow.parquet as pq

        inp = os.path.join(work, "docs.parquet")
        pq.write_table(pq.read_table(DOCS).slice(0, N_DOCS), inp)
        out = os.path.join(work, "idx")

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be the ONLY source
        env["SPARK_GRAFT_CPUS"] = "2"
        proc = subprocess.run(
            [
                "spark-submit",
                "--master",
                "local[2]",
                "--py-files",
                zip_path,
                os.path.join(jobdir, "build_job.py"),
                "--input",
                inp,
                "--output",
                out,
                "--segments",
                "--shard-docs",
                str(SHARD_DOCS),
            ],
            cwd=work,
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        if verbose or proc.returncode != 0:
            sys.stderr.write(proc.stdout[-4000:])
            sys.stderr.write(proc.stderr[-4000:])
        assert proc.returncode == 0, (
            f"spark-submit failed rc={proc.returncode}"
        )
        metrics_lines = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"n_docs"' in ln
        ]
        assert metrics_lines, "job printed no JSON metrics line"
        m = json.loads(metrics_lines[-1])
        assert m["n_docs"] == N_DOCS, m
        assert m["n_shards"] == (N_DOCS + SHARD_DOCS - 1) // SHARD_DOCS, m
        assert m["built_shards"] == m["n_shards"], m

        with open(os.path.join(out, "manifest.json")) as fh:
            manifest = json.load(fh)
        assert len(manifest["shards"]) == m["n_shards"], manifest
        for shard in manifest["shards"]:
            seg_file = os.path.join(out, "segments", shard["file"])
            assert os.path.isfile(seg_file), f"missing {seg_file}"
            assert shard["n_postings"] > 0, shard
        for sub in ("postings", "docstats", "termdict"):
            assert os.path.isdir(os.path.join(out, sub)), sub
        return m
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    print(json.dumps(run_smoke(verbose="-v" in sys.argv)))
