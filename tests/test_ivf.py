"""IVF coarse-quantizer ANN (vecops.ivf_*): deterministic LCG init + Lloyd
refinement, nprobe inverted-list probing, exact cosine rerank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iresearch_spark import vecops


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # three well-separated clusters in 16d
    centers = rng.normal(size=(3, 16)) * 5
    rows = []
    vid = 0
    for ci in range(3):
        for _ in range(40):
            v = centers[ci] + rng.normal(size=16) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_centroids_deterministic(emb):
    c1 = vecops.ivf_centroids(emb, n_lists=4, seed=23, refine_iters=1)
    c2 = vecops.ivf_centroids(emb, n_lists=4, seed=23, refine_iters=1)
    assert c1 == c2
    assert len(c1) == 4 and len(c1[0]) == 16


def test_refinement_moves_centroids_toward_data(emb):
    c0 = [[round(v, 6) for v in c] for c in vecops.hyperplanes(16, 4, 23)]
    c1 = vecops.ivf_centroids(emb, n_lists=4, seed=23, refine_iters=1)
    assert c1 != c0  # at least one list was non-empty and its mean moved


def test_assignment_partitions_all_vectors(emb):
    cents = vecops.ivf_centroids(emb, n_lists=4, seed=23)
    counts = (
        emb.select(vecops.ivf_assign_col("embedding", cents).alias("lid"))
        .groupBy("lid").count().collect()
    )
    assert sum(int(r["count"]) for r in counts) == emb.count()


def test_ivf_topk_high_recall_on_clustered_data(emb):
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in vecops.cosine_topk(emb, qv, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in vecops.ivf_topk(emb, qv, k=10, n_lists=4, nprobe=2, seed=23).collect()
    ]
    # clustered data + 2-of-4 probes: the query's own cluster is covered
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9
    # approx results are a subset of the corpus ordered by exact cosine
    assert approx == sorted(
        approx,
        key=lambda v: (-[r["cos_sim"] for r in
                         vecops.cosine_topk(emb, qv, k=200).collect()
                         if r["vec_id"] == v][0], v),
    )


def test_materialized_probe_prunes_partitions(emb, tmp_path):
    cents = vecops.ivf_centroids(emb, n_lists=4, seed=23)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    mat = vecops.ivf_materialize(emb, cents, str(tmp_path / "ivf"))
    assert "list_id" in mat.columns
    # identical results materialized vs in-scan assignment
    got = [
        (r["vec_id"], round(r["cos_sim"], 4))
        for r in vecops.ivf_topk(mat, qv, k=10, nprobe=2, centroids=cents).collect()
    ]
    exp = [
        (r["vec_id"], round(r["cos_sim"], 4))
        for r in vecops.ivf_topk(emb, qv, k=10, n_lists=4, nprobe=2, seed=23).collect()
    ]
    assert got == exp
    # the probe must be a Catalyst PARTITION filter: the physical scan of the
    # probed table lists only the probed list_id directories
    probe = vecops.ivf_probe_lists(qv, cents, 2)
    cand = mat.where(F.col("list_id").isin(probe))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    # list_id must appear as a PARTITION filter (directory pruning), not a
    # post-scan data filter
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "list_id" in pf, plan
    # and the probe reads exactly the probed lists' rows
    sizes = {int(r["list_id"]): int(r["count"]) for r in mat.groupBy("list_id").count().collect()}
    assert cand.count() == sum(sizes.get(p, 0) for p in probe)


def test_probe_scans_subset(emb):
    cents = vecops.ivf_centroids(emb, n_lists=4, seed=23)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    probe_df = emb.where(
        vecops.ivf_assign_col("embedding", cents).isin([0, 1, 2, 3])
    )
    assert probe_df.count() == emb.count()
    # single-probe candidate set is a strict subset on clustered data
    one = vecops.ivf_topk(emb, qv, k=1000, n_lists=4, nprobe=1, seed=23).count()
    assert 0 < one < emb.count()
