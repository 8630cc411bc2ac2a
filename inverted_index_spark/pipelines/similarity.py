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

from pyspark.sql import DataFrame, Window
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


def _sig_col(planes, vec):
    """Bit-packed hyperplane signature as a Column (JVM-side)."""
    bits = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, p) >= 0, F.shiftleft(F.lit(1), i)).otherwise(0)
        bits = bit if bits is None else bits + bit
    return bits


def _sig_val(planes, query_vec) -> int:
    v = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * float(b) for a, b in zip(query_vec, plane)) >= 0:
            v |= 1 << i
    return v


def _probe_sigs(q_sig: int, n_planes: int, hamming: int) -> List[int]:
    """All signatures within the given hamming radius of the query's."""
    from itertools import combinations

    probe = []
    for h in range(min(hamming, n_planes) + 1):
        for flips in combinations(range(n_planes), h):
            s = q_sig
            for b in flips:
                s ^= 1 << b
            probe.append(s)
    return probe


class LshIndex:
    """Build-once random-hyperplane LSH index.

    ``signed`` is the signature-annotated vector table (vid, v, sig) —
    computed ONCE at build time; every search only filters it by probe
    signatures. When saved, the table is partitioned by ``sig`` so a
    probe reads only its buckets' files (partition pruning)."""

    def __init__(self, signed: DataFrame, planes: List[List[float]]):
        self.signed = signed
        self.planes = planes


def build_lsh(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: str = "fts",
) -> LshIndex:
    """One distributed pass: signature every vector. No per-query work
    remains except a bucket filter + exact re-score."""
    if dim is None:
        row = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = row["d"] if row else 0
    planes = _hyperplanes(dim, n_planes, seed=seed)
    signed = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        _sig_col(planes, F.col(vec_col)).alias("sig"),
    )
    return LshIndex(signed, planes)


def save_lsh(index: LshIndex, path: str) -> None:
    """Persist: vectors partitioned by signature + planes sidecar."""
    import json
    import os

    index.signed.write.mode("overwrite").partitionBy("sig").parquet(
        f"{path}/vectors"
    )
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/planes.json", "w") as f:
        json.dump(index.planes, f)


def load_lsh(spark, path: str) -> LshIndex:
    import json

    with open(f"{path}/planes.json") as f:
        planes = json.load(f)
    return LshIndex(spark.read.parquet(f"{path}/vectors"), planes)


def lsh_search(
    index: LshIndex,
    query_vec: Sequence[float],
    k: int = 10,
    hamming: int = 1,
) -> DataFrame:
    """ANN top-k against a prebuilt LshIndex: filter the signed table to
    buckets within ``hamming`` bit flips of the query signature, then
    exact cosine re-score. On a saved index the filter is a partition
    predicate — only probe buckets are read. ``hamming == n_planes``
    probes every bucket and is exact (== brute force)."""
    n_planes = len(index.planes)
    probe = _probe_sigs(_sig_val(index.planes, query_vec), n_planes, hamming)
    cands = index.signed.filter(F.col("sig").isin(probe))
    return cosine_topk(cands, query_vec, k=k, id_col="vid", vec_col="v")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming: int = 1,
) -> DataFrame:
    """Convenience build+search in one call (test scale). Production
    builds the index once (``build_lsh``/``save_lsh``) and issues
    ``lsh_search`` against it; this wrapper re-signatures the corpus
    per call and exists for small-data ergonomics only."""
    idx = build_lsh(
        embeddings, n_planes=n_planes, id_col=id_col, vec_col=vec_col,
        dim=len(query_vec),
    )
    return lsh_search(idx, query_vec, k=k, hamming=hamming)


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

    The sample is a REAL random sample: a Bernoulli pass sized from
    the table count (``fraction = min(1, 4*sample/N)``) bounds the
    candidate set to ~4*sample rows, then a seeded-random shuffle of
    that small set breaks partition order before the limit. A bare
    ``limit(sample)`` would take the first rows in partition order —
    at corpus scale that is one shard's data and the centroids would
    be fit on whatever that shard happens to contain (e.g. a
    time-ordered table's oldest slice); the head of a Bernoulli sample
    is equally early-partition-biased, hence the shuffle.
    """
    import numpy as np

    n = embeddings.count()
    frac = min(1.0, (4.0 * sample) / max(n, 1))
    rows = (
        embeddings.select(vec_col)
        .sample(fraction=frac, seed=seed)
        # the sort input is <= ~4*sample rows regardless of N
        .orderBy(F.rand(seed + 1))
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


class IvfIndex:
    """Build-once IVF index: centroids + nearest-cell vector table.

    ``assigned`` (vid, v, cell) is computed ONCE at build; a query only
    ranks centroids driver-side (tiny) and filters its probe cells. When
    saved, the table is partitioned by ``cell`` so probes read only
    their cells' files."""

    def __init__(self, assigned: DataFrame, centroids):
        self.assigned = assigned
        self.centroids = centroids


def build_ivf(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> IvfIndex:
    """Fit centroids on a driver-side sample, assign every vector to its
    nearest cell in one distributed pass. Per-query work afterwards is
    O(n_centroids) driver-side + a cell-pruned scan.

    Pass ``centroids`` (e.g. from the full-corpus :func:`kmeans`) to
    skip the sampled fit and build the cell table around a
    higher-quality coarse quantizer; ``n_centroids`` is IGNORED then —
    the passed list's length defines the cell count (check
    ``len(index.centroids)``, not the argument you sized probes for).
    """
    cent = (
        centroids
        if centroids is not None
        else _kmeans_centroids(embeddings, n_centroids, vec_col)
    )
    return IvfIndex(ivf_assign(embeddings, cent, id_col, vec_col), cent)


def save_ivf(index: IvfIndex, path: str) -> None:
    import json
    import os

    index.assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors"
    )
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/centroids.json", "w") as f:
        json.dump([list(map(float, c)) for c in index.centroids], f)


def load_ivf(spark, path: str) -> IvfIndex:
    import json

    import numpy as np

    with open(f"{path}/centroids.json") as f:
        cent = np.array(json.load(f), dtype=np.float64)
    return IvfIndex(spark.read.parquet(f"{path}/vectors"), cent)


def ivf_search(
    index: IvfIndex,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe the ``n_probe`` nearest cells of a prebuilt IvfIndex and
    exact-rescore. ``n_probe >= n_centroids`` is exact."""
    import numpy as np

    cent = np.asarray(index.centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(cent @ q))[:n_probe].tolist()
    cands = index.assigned.filter(F.col("cell").isin(probe))
    return cosine_topk(cands, query_vec, k=k, id_col="vid", vec_col="v")


def ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience build+search in one call (test scale). Production
    builds once (``build_ivf``/``save_ivf``) and issues ``ivf_search``
    against the cell-partitioned table; this wrapper refits and
    reassigns per call and exists for small-data ergonomics only."""
    idx = build_ivf(embeddings, n_centroids, id_col, vec_col)
    return ivf_search(idx, query_vec, k=k, n_probe=n_probe)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    n_planes: int | None = None,
    hamming: int = 1,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): top-k corpus neighbors for EVERY
    query row — the batch ANN join a retrieval-mining / hard-negative
    pipeline runs, where ``cosine_topk`` answers only one vector.

    ``n_planes=None`` — exact: the query side is broadcast against the
    corpus (one corpus scan, no corpus-side shuffle to form pairs),
    then one window per query ranks candidates. The scored-pair shuffle
    is |queries| x |corpus| rows, so this is the correctness baseline
    and the small-query-batch path.

    ``n_planes`` set — LSH-bucketed scale path: both sides are signed
    with the same deterministic hyperplanes; each query is expanded to
    every signature within ``hamming`` bit flips (probe expansion,
    sum-of-binomials masks) and candidates come from an equi-join on
    the signature — pair count is bucket-bounded, never q x c. Exact
    cosine re-score + per-query top-k as above.
    ``hamming == n_planes`` probes every bucket and equals the exact
    path (pinned by test).
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    if n_planes is None:
        pairs = c.crossJoin(F.broadcast(q))
    else:
        from itertools import combinations

        dim_row = corpus.select(F.size(vec_col).alias("d")).first()
        dim = dim_row["d"] if dim_row else 0
        planes = _hyperplanes(dim, n_planes)
        masks = []
        for h in range(min(hamming, n_planes) + 1):
            for flips in combinations(range(n_planes), h):
                m = 0
                for b in flips:
                    m |= 1 << b
                masks.append(m)
        csig = c.withColumn("sig", _sig_col(planes, F.col("cv")))
        qsig = (
            q.withColumn("sig0", _sig_col(planes, F.col("qv")))
            .withColumn(
                "mask", F.explode(F.array(*[F.lit(m) for m in masks]))
            )
            .withColumn("sig", F.col("sig0").bitwiseXOR(F.col("mask")))
            .select("query_id", "qv", "sig")
        )
        pairs = csig.join(F.broadcast(qsig), "sig")
    cos = _dot(F.col("cv"), F.col("qv")) / (
        _norm(F.col("cv")) * _norm(F.col("qv"))
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(cos, 4).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


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
    with_sig = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        _sig_col(planes, F.col(vec_col)).alias("sig"),
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


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "fts",
):
    """Distributed spherical k-means over the FULL corpus -> (centroids,
    assigned DataFrame (vid, cell, sim)).

    The corpus-clustering primitive training pipelines use for mixture
    analysis, domain bucketing and IVF coarse quantizers. Unlike
    ``_kmeans_centroids`` (which Lloyd-iterates a driver-side SAMPLE —
    fine for seeding IVF, blind to clusters smaller than the sample
    rate), every assignment and every centroid update here sees every
    vector, so small-but-real clusters survive.

    Deterministic up to floating-point summation order, no RNG state:
    initial centroids are the ``k`` vectors with the smallest
    ``(md5(seed|id), id)`` rank — a pure function of the ids,
    layout/partitioning-independent, and reproducible in any SQL
    engine (the contract oracle re-runs the whole algorithm). The
    per-(cell, dim) means are partial-aggregated doubles, so their
    low-order bits depend on partition layout; a near-tie argmax (or a
    value landing exactly on a rounding boundary) can therefore flip
    between runs or engines. The contract rounds similarities to 4
    decimals, which has held stable in practice but is not a
    bit-exactness guarantee. Vectors are L2-normalized once up front;
    centroids are re-normalized after each mean, so "nearest" is
    cosine throughout (spherical k-means). An emptied cell keeps its
    previous centroid.

    Scale (the classic Spark Lloyd shape, per iteration):

    - assignment: centroids ride into the plan as literals (broadcast
      by construction, k*dim floats) and the argmax fold is JVM-side
      whole-stage codegen — one narrow pass, no shuffle, no Python;
    - update: per-(cell, dim) running means via posexplode + partial
      agg — the shuffle carries k*dim rows per partition after the
      map-side combine, never the vectors themselves;
    - driver state is k*dim floats per iteration; ``iters`` Spark jobs
      total. Nothing is corpus-quadratic and nothing large ever
      collects.
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # norm projected as a scalar column BEFORE the per-element lambda —
    # no CSE inside HOF lambdas, so an inline _norm() would re-reduce
    # the whole vector per element (O(dim^2) per row, the house rule)
    normed = (
        embeddings.select(
            F.col(id_col).alias("vid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "_dv"
            ),
        )
        .select(
            "vid", "_dv", F.greatest(_norm(F.col("_dv")), F.lit(1e-12)).alias("_nv")
        )
        .select(
            "vid",
            F.transform(F.col("_dv"), lambda x: x / F.col("_nv")).alias("v"),
        )
    )
    seeds = (
        normed.select(
            "vid",
            "v",
            F.md5(F.concat(F.lit(seed + "|"), F.col("vid").cast("string")))
            .alias("h"),
        )
        .orderBy(F.asc("h"), F.asc("vid"))
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans needs a non-empty embeddings table")
    # fewer vectors than k: proceed with effective k = n (the returned
    # centroid list's length is authoritative), mirroring
    # _kmeans_centroids' min(n_centroids, sample) behavior
    cent = np.array([r["v"] for r in seeds], dtype=np.float64)

    def _assign(frame: DataFrame, centroids) -> DataFrame:
        best_sim, best_idx = None, None
        for i, c in enumerate(centroids):
            p = F.array(*[F.lit(float(x)) for x in c])
            sim = _dot(F.col("v"), p)
            if best_sim is None:
                best_sim, best_idx = sim, F.lit(i)
            else:
                # strict > keeps the FIRST (lowest-index) cell on ties
                best_idx = F.when(sim > best_sim, F.lit(i)).otherwise(best_idx)
                best_sim = F.greatest(sim, best_sim)
        return frame.select(
            "vid", "v", best_idx.alias("cell"), best_sim.alias("sim")
        )

    for _ in range(iters):
        assigned = _assign(normed, cent)
        rows = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cent.copy()
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["m"]
        for c, dims in by_cell.items():
            m = np.array([dims[d] for d in sorted(dims)], dtype=np.float64)
            new[c] = m / max(np.linalg.norm(m), 1e-12)
        cent = new
    final = _assign(normed, cent).select("vid", "cell", "sim")
    return [list(map(float, c)) for c in cent], final
