"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the query vector and
one JVM-side pass (zip_with + aggregate), linear in corpus size and
embarrassingly parallel.

Scale path: SimHash-style random-hyperplane LSH bucketing (deterministic
md5-seeded hyperplanes) so candidate generation is a bucket-join instead
of all-pairs; then exact re-scoring within candidates. At 10^9+ vectors
this is the standard IVF/LSH trade: recall vs touched partitions.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_to_query(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cos) cosine similarity of every row to a constant query
    vector (broadcast as a literal — no shuffle at all)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return embeddings.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k (TakeOrderedAndProject; no shuffle)."""
    return (
        cosine_to_query(embeddings, query_vec, id_col, vec_col)
        .withColumn("cos", F.round("cos", 4))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "fts") -> List[List[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state,
    reproducible across engines and runs."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{j}".encode()).hexdigest()
            u = int(h[:8], 16) / 0xFFFFFFFF  # [0, 1]
            row.append(math.sqrt(-2.0 * math.log(max(u, 1e-12))) *
                       math.cos(2.0 * math.pi * (int(h[8:16], 16) / 0xFFFFFFFF)))
        planes.append(row)
    return planes


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: random-hyperplane signature bucket prune, then exact
    cosine within the query's bucket (falls back to hamming<=1 buckets).

    At cluster scale the signature is a partition key: only matching
    buckets are scanned. Approximate — recall measured in tests against
    the brute-force baseline.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)

    def sig_col(vec):
        bits = None
        for i, plane in enumerate(planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(_dot(vec, p) >= 0, F.shiftleft(F.lit(1), i)).otherwise(0)
            bits = bit if bits is None else bits + bit
        return bits

    q_sig_val = 0
    for i, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if d >= 0:
            q_sig_val |= 1 << i
    with_sig = embeddings.withColumn("sig", sig_col(F.col(vec_col)))
    # hamming distance 0 or 1 buckets: query sig plus single-bit flips
    probe = [q_sig_val] + [q_sig_val ^ (1 << i) for i in range(n_planes)]
    candidates = with_sig.filter(F.col("sig").isin(probe))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def _kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    vec_col: str,
    sample: int = 2048,
    iters: int = 5,
    seed: int = 7,
) -> "np.ndarray":
    """Deterministic mini k-means on a driver-side sample.

    Centroid fitting needs only a representative sample (IVF practice);
    the expensive part — assigning every vector — stays distributed.
    Sampling is seeded and the iteration is plain numpy, so centroids
    are reproducible run to run.
    """
    import numpy as np

    rows = (
        embeddings.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cell) — nearest-centroid assignment, fully JVM-side.

    At cluster scale ``cell`` becomes the partition key of the vector
    table, so a probe touches only its cells' partitions.
    """
    best_sim = None
    best_idx = None
    for i, c in enumerate(centroids):
        p = F.array(*[F.lit(float(v)) for v in c])
        sim = _dot(F.col(vec_col), p) / F.greatest(
            _norm(F.col(vec_col)), F.lit(1e-12)
        )
        if best_sim is None:
            best_sim, best_idx = sim, F.lit(i)
        else:
            best_idx = F.when(sim > best_sim, F.lit(i)).otherwise(best_idx)
            best_sim = F.greatest(sim, best_sim)
    return embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        best_idx.alias("cell"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells only.

    Classic inverted-file ANN: vectors are bucketed by nearest centroid
    (one distributed pass), the query scans just its probe cells' rows
    and re-scores them exactly. Recall/probes trade measured against the
    brute-force baseline in tests/test_pipelines.py.
    """
    import numpy as np

    cent = _kmeans_centroids(embeddings, n_centroids, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(cent @ q))[:n_probe].tolist()
    assigned = ivf_assign(embeddings, cent, id_col, vec_col)
    cands = assigned.filter(F.col("cell").isin(probe)).select(
        F.col("vid").alias(id_col), F.col("v").alias(vec_col)
    )
    return cosine_topk(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def neardup_pairs_cosine(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos) embedding near-duplicate pairs.

    Candidates share an LSH signature bucket (self-join within bucket,
    never all-pairs), then exact cosine >= threshold verification."""
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    planes = _hyperplanes(dim, n_planes)
    bits = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(F.col(vec_col), p) >= 0, F.shiftleft(F.lit(1), i)).otherwise(
            0
        )
        bits = bit if bits is None else bits + bit
    with_sig = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), bits.alias("sig")
    )
    l = with_sig.alias("l")
    r = with_sig.alias("r")
    pairs = l.join(
        r,
        (F.col("l.sig") == F.col("r.sig")) & (F.col("l.vid") < F.col("r.vid")),
    )
    cos = _dot(F.col("l.v"), F.col("r.v")) / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
    return (
        pairs.select(
            F.col("l.vid").alias("vec_a"),
            F.col("r.vid").alias("vec_b"),
            F.round(cos, 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
