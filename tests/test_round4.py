"""Round-4 regressions: MinHash-LSH band-bucket skew cap, bit-stable IVF
centroids, clear compile-time errors for nested positional filters and
unrestorable append analyzers, and legacy (pre-multi-field) consolidate
compatibility."""

import pytest
from pyspark.sql import functions as F

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt
from iresearch_spark import textops, vecops


# --------------------------------------------------------------------------
# minhash_lsh_pairs max_bucket: one boilerplate bucket (identical docs →
# identical banded signatures) must not go quadratic
# --------------------------------------------------------------------------


def _boiler_corpus(spark, n_boiler=40, n_real=6):
    rows = []
    # boilerplate: IDENTICAL text → identical minhash signature → one bucket
    # per band with n_boiler members
    for i in range(n_boiler):
        rows.append((i, "the quick brown fox jumps over the lazy dog again and again"))
    # distinct docs that are near-dups of each other pairwise
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for j in range(n_real):
        rows.append((1000 + j, base + f" tail{j // 2}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_bucket_cap_bounds_pairs(spark):
    df = _boiler_corpus(spark)
    uncapped = textops.minhash_lsh_pairs(df, num_hashes=8, bands=4).count()
    capped = textops.minhash_lsh_pairs(df, num_hashes=8, bands=4, max_bucket=8).count()
    # 40 identical docs → C(40,2) = 780 pairs uncapped; the capped run drops
    # the boilerplate buckets entirely while small buckets survive
    assert uncapped >= 780
    assert capped < 780
    # pairs from small (<=8 member) buckets are retained
    small = textops.minhash_lsh_pairs(
        df.where(F.col("doc_id") >= 1000), num_hashes=8, bands=4, max_bucket=8
    ).count()
    assert capped >= small > 0


def test_lsh_bucket_cap_is_lower_bound(spark):
    # capped result ⊆ uncapped result (deterministic drop, never additions)
    df = _boiler_corpus(spark, n_boiler=12, n_real=4)
    cap = {
        (r["a"], r["b"])
        for r in textops.minhash_lsh_pairs(df, num_hashes=8, bands=4, max_bucket=6).collect()
    }
    unc = {
        (r["a"], r["b"])
        for r in textops.minhash_lsh_pairs(df, num_hashes=8, bands=4).collect()
    }
    assert cap <= unc


# --------------------------------------------------------------------------
# IVF centroids: fixed-point integer sums → bit-identical across partitionings
# --------------------------------------------------------------------------


def test_ivf_centroids_partition_invariant(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(1)
    df7 = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(7)
    c1 = vecops.ivf_centroids(df1, n_lists=4, seed=23, dim=8)
    c7 = vecops.ivf_centroids(df7, n_lists=4, seed=23, dim=8)
    assert c1 == c7  # exact equality, not approx — integer sums are associative


# --------------------------------------------------------------------------
# compile-time errors instead of kernel-time failures
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4tiny"))
    df = spark.createDataFrame(
        [("d1", "fast scan merge"), ("d2", "slow scan"), ("d3", "fast merge")],
        "doc_key string, text string",
    )
    IndexBuilder(spark, path, num_segments=1).build(df, key_col="doc_key", text_col="text")
    return IndexReader(spark, path)


def test_nested_phrase_raises_at_compile(spark, tiny_idx):
    s = Searcher(tiny_idx)
    with pytest.raises(ValueError, match="cannot be nested"):
        s.search(flt.And((flt.Term("fast"), flt.Phrase(("fast", "scan")))), k=5)
    with pytest.raises(ValueError, match="cannot be nested"):
        s.search(flt.Or((flt.Term("fast"), flt.SamePosition(("a", "b")))), k=5)


def test_append_callable_analyzer_rejected(spark, tmp_path):
    path = str(tmp_path / "r4callable")

    def my_analyzer(texts):  # a callable analyzer: persisted only as repr()
        return texts.str.split(" ")

    df = spark.createDataFrame([("d1", "a b c")], "doc_key string, text string")
    b = IndexBuilder(spark, path, num_segments=1)
    b.build(df, key_col="doc_key", fields=(("body", "text", my_analyzer),))
    df2 = spark.createDataFrame([("d2", "c d e")], "doc_key string, text string")
    with pytest.raises(ValueError, match="callable analyzer"):
        IndexBuilder(spark, path, num_segments=1).append(df2)
    # passing fields explicitly works
    IndexBuilder(spark, path, num_segments=1).append(
        df2, fields=(("body", "text", my_analyzer),)
    )
    reader = IndexReader(spark, path)
    got = Searcher(reader).search(flt.Term("c"), k=5).count()
    assert got == 2


# --------------------------------------------------------------------------
# consolidate over a legacy index whose postings/norms lack the field column
# --------------------------------------------------------------------------


def test_consolidate_legacy_no_field_column(spark, tmp_path):
    import glob
    import os

    from iresearch_spark.index.consolidate import consolidate

    path = str(tmp_path / "r4legacy")
    df = spark.createDataFrame(
        [(f"d{i}", f"scan merge pad{i % 3} " + "filler " * (i % 4)) for i in range(40)],
        "doc_key string, text string",
    )
    IndexBuilder(spark, path, num_segments=2).build(df, key_col="doc_key", text_col="text")
    reader = IndexReader(spark, path)
    before = [
        (r["doc_key"], round(r["score"], 6))
        for r in Searcher(reader).search(flt.Term("scan"), k=10).collect()
    ]
    # strip the field column in place (simulates a pre-multi-field commit)
    for tbl in ("postings", "norms"):
        src = reader.meta["tables"][tbl]
        src = src if isinstance(src, str) else src[0]
        stripped = spark.read.parquet(src).drop("field")
        tmp_out = src + "_nofield"
        stripped.write.mode("overwrite").parquet(tmp_out)
        for f in glob.glob(os.path.join(src, "*")):
            os.remove(f) if os.path.isfile(f) else None
        for f in glob.glob(os.path.join(tmp_out, "*")):
            os.replace(f, os.path.join(src, os.path.basename(f)))
    reader = IndexReader(spark, path)
    consolidate(reader)  # must not raise AnalysisException on 'field'
    reader2 = IndexReader(spark, reader.index_path)
    after = [
        (r["doc_key"], round(r["score"], 6))
        for r in Searcher(reader2).search(flt.Term("scan"), k=10).collect()
    ]
    assert after == before
