"""Similarity search over embedding columns (array<float>).

Two paths, as a training-data pipeline needs at 100 TB:

* :func:`cosine_topk` — exact brute-force top-k vs a broadcast query vector.
  The dot product is a JVM-side ``aggregate(zip_with(...))`` expression
  (whole-stage codegen, no Python). At scale: one narrow map + a global top-k
  (per-partition heads then driver merge) — no shuffle of the corpus.
* :func:`lsh_bucket_candidates` — random-hyperplane (sign) LSH bucketing: the
  scale path for pairwise near-dup / ANN. Hyperplanes are deterministic
  (seeded LCG baked into plan literals). Candidates join on bucket id
  (uniform), then exact cosine reranks.
* :func:`cosine_pairs` — exact all-pairs above a threshold (for candidate
  verification or small dims); quadratic, use only behind LSH at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim_col(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(x * x for x in query))
    return _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k vs a constant query vector."""
    sim = cosine_sim_col(vec_col, query)
    if round_to is not None:
        sim = F.round(sim, round_to).cast("double")
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (a<b). Quadratic — candidate
    verification / small corpora only; LSH path below for scale."""
    l = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    r = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    if round_to is not None:
        sim = F.round(sim, round_to).cast("double")
    return (
        l.crossJoin(r)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG → uniform in [-1,1))."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append((state / float(2**63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature_col(vec_col: str, planes: list[list[float]]):
    """Sign-LSH bucket id: bit i = (v · plane_i) >= 0, packed into a long."""
    bits = []
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(F.col(vec_col), pc) >= 0, F.lit(1 << i).cast("bigint")).otherwise(0))
    acc = F.lit(0).cast("bigint")
    for b in bits:
        acc = acc + b
    return acc


def lsh_bucket_candidates(
    df: DataFrame,
    n_planes: int = 12,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN candidate pairs: vectors sharing a sign-LSH bucket (a<b).

    Scale path: |docs| rows keyed by bucket → self-join on bucket (uniform by
    construction when planes are random); rerank with exact cosine.
    ``max_bucket`` caps the quadratic fanout per bucket (skew guard): buckets
    with more members are dropped from the pair join — a degenerate bucket
    (e.g. near-zero vectors all hashing together) would otherwise dominate
    the shuffle at scale. Deterministic: the cap is a property of the bucket
    histogram, not of sampling."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    sig = df.select(F.col(id_col), lsh_signature_col(vec_col, planes).alias("bucket"))
    # one grouped stage instead of a bucket self-join (same rewrite as
    # textops.minhash_lsh_pairs): collect each bucket's members (the only
    # shuffle after the signature map), apply the skew cap as an array-size
    # filter — the former count-aggregate + broadcast join re-evaluated the
    # signature dot products per branch — and expand the within-bucket pairs
    # JVM-side.  Per-row fan-out bounded by max_bucket²/2.
    size_ok = F.size("ids") >= 2
    if max_bucket is not None:
        size_ok = size_ok & (F.size("ids") <= max_bucket)
    return (
        sig.groupBy("bucket")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .where(size_ok)
        .select(
            F.col("bucket"),
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
                    "struct(least(x, y) as a, greatest(x, y) as b))))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "bucket")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket: int | None = 512,
    round_to: int | None = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs AT SCALE: sign-LSH bucketed
    candidate generation (:func:`lsh_bucket_candidates` — vectors within
    cosine θ of each other agree on a random hyperplane with probability
    1−θ/π, so near-dups collide in few-plane buckets) followed by an exact
    cosine rerank over candidates only, keeping pairs ≥ ``threshold``.

    The shuffle is |docs| rows keyed by bucket + the capped within-bucket
    join — never the |docs|² crossJoin of :func:`cosine_pairs`. Recall is
    the LSH collision probability (1−θ/π)^n_planes per pair (candidate-
    generation trade, same contract as the capped MinHash-LSH path);
    deterministic planes → the whole plan replays in the SQL oracle."""
    # each vector lands in exactly ONE bucket (a single n_planes-bit
    # signature), so (a, b) pairs are already unique — no dedup shuffle
    cand = lsh_bucket_candidates(
        df, n_planes=n_planes, seed=seed, id_col=id_col, vec_col=vec_col,
        dim=dim, max_bucket=max_bucket,
    ).select("a", "b")
    l = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    r = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    if round_to is not None:
        sim = F.round(sim, round_to).cast("double")
    return (
        cand.join(l, "a").join(r, "b")
        .select("a", "b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_assign_col(vec_col: str, centroids: list[list[float]]):
    """Index of the nearest centroid by L2 distance (ties → smallest index).

    One JVM expression: an array of (distance, index) structs reduced with
    ``array_min`` (struct ordering = lexicographic) — whole-stage codegen,
    no Python, no shuffle. The distance uses the algebraic form
    ``|v|² − 2·v·c + |c|²`` rounded to 6 decimals so a SQL oracle computing
    the same dot products reproduces the identical assignment (float
    summation-order noise is far below the rounding grain)."""
    vv = _dot(F.col(vec_col), F.col(vec_col))
    entries = []
    for i, c in enumerate(centroids):
        cc = F.array(*[F.lit(float(x)) for x in c])
        cnorm = sum(x * x for x in c)
        d = F.round(vv - 2.0 * _dot(F.col(vec_col), cc) + F.lit(cnorm), 6)
        entries.append(F.named_struct(F.lit("d"), d, F.lit("i"), F.lit(i)))
    return F.array_min(F.array(*entries)).getField("i")


def ivf_centroids(
    df: DataFrame,
    n_lists: int = 8,
    seed: int = 23,
    vec_col: str = "embedding",
    dim: int | None = None,
    refine_iters: int = 1,
    round_to: int = 6,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seeded LCG initial centroids +
    ``refine_iters`` Lloyd mean-update passes (k-means with FIXED init).

    Each pass is one distributed job: assign (in-scan expression) →
    ``posexplode`` → per-(list, dim) mean — the collected result is
    n_lists × dim rows (tiny). The mean is computed as an EXACT fixed-point
    integer sum (values scaled by 10^round_to, rounded to integers, summed
    as BIGINT): integer addition is associative, so the centroid is
    bit-stable across Spark partition orders AND across engines — the SQL
    oracle replays the identical arithmetic, with no summation-order noise
    left for rounding to absorb. Empty lists keep their previous centroid."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    scale = 10 ** round_to
    cents = [[round(v, round_to) for v in c] for c in hyperplanes(dim, n_lists, seed)]
    for _ in range(refine_iters):
        assigned = df.select(
            ivf_assign_col(vec_col, cents).alias("lid"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        rows = (
            assigned.groupBy("lid", "pos")
            .agg(
                F.sum(F.round(F.col("val") * scale).cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            new[int(r["lid"])][int(r["pos"])] = round(
                int(r["s"]) / (int(r["c"]) * scale), round_to
            )
        cents = new
    return cents


def ivf_materialize(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Persist the corpus PARTITIONED BY its IVF list assignment and return
    the partitioned table.

    This is what makes IVF an actual ANN index at 100 TB: ``list_id`` becomes
    a physical partition directory, so a probe (``list_id IN (...)``) is a
    Catalyst partition filter — only ~nprobe/n_lists of the files are even
    listed, instead of re-evaluating the assignment expression over every row
    per query. The assignment expression itself is deterministic
    (:func:`ivf_assign_col`), so the materialized table replays exactly."""
    out = df.select(
        F.col(id_col), F.col(vec_col), ivf_assign_col(vec_col, centroids).alias("list_id")
    )
    out.write.partitionBy("list_id").mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def ivf_probe_lists(query: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """The ``nprobe`` list ids nearest the query (same rounded algebraic L2
    as :func:`ivf_assign_col`, ties to the smaller id)."""
    qq = sum(x * x for x in query)
    dists = sorted(
        (round(qq - 2.0 * sum(a * b for a, b in zip(query, c)) + sum(x * x for x in c), 6), i)
        for i, c in enumerate(centroids)
    )
    return [i for _, i in dists[:nprobe]]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_lists: int = 8,
    nprobe: int = 2,
    seed: int = 23,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: exact cosine restricted to the ``nprobe``
    inverted lists whose centroids are nearest the query.

    The scale path next to sign-LSH. When ``df`` carries a ``list_id``
    column (a table written by :func:`ivf_materialize`), the probe is a
    partition filter — Catalyst prunes the non-probed lists' files and only
    ~nprobe/n_lists of the corpus is read. Otherwise the assignment
    expression is evaluated in-scan (correct, but a full-corpus scan per
    query — materialize for ANN-grade probe cost)."""
    if centroids is None:
        centroids = ivf_centroids(df, n_lists, seed, vec_col, dim=len(query))
    probe = ivf_probe_lists(query, centroids, nprobe)
    if "list_id" in df.columns:
        cand = df.where(F.col("list_id").isin(probe))
    else:
        cand = df.where(ivf_assign_col(vec_col, centroids).isin(probe))
    return cosine_topk(cand, query, k, id_col, vec_col)


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict exact cosine to vectors whose LSH bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe LSH)."""
    dim = len(query)
    planes = hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qbits |= 1 << i
    sig = df.withColumn("bucket", lsh_signature_col(vec_col, planes))
    # popcount(bucket XOR qbits) <= probe_hamming
    x = F.col("bucket").bitwiseXOR(F.lit(qbits).cast("bigint"))
    pop = sum(
        F.when(x.bitwiseAND(F.lit(1 << i).cast("bigint")) != 0, 1).otherwise(0)
        for i in range(n_planes)
    )
    cand = sig.where(pop <= probe_hamming)
    return cosine_topk(cand, query, k, id_col, vec_col)
