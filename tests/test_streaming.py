"""Incremental appends + Structured Streaming ingestion."""

import os

import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt
from tests.oracle import ScalarIndex

BATCH1 = {
    "a0001": "spark scan merge fast",
    "a0002": "scan table slow window",
    "a0003": "merge sort scan batch",
}
BATCH2 = {
    "b0001": "query plan scan filter",
    "b0002": "fast slow spark merge scan",
    "b0003": "table scan index spark",
}


def _check_against_oracle(spark, path, docs, term="scan"):
    reader = IndexReader(spark, path)
    s = Searcher(reader)
    got = [(r["doc_key"], r["score"]) for r in s.search(flt.Term(term), k=100).collect()]
    exp = ScalarIndex(docs).term_query(term, k=100)
    assert sorted((k, round(v, 9)) for k, v in got) == sorted(
        (k, round(v, 9)) for k, v in exp
    )


def test_append_batches(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("appidx"))
    b = IndexBuilder(spark, path, num_segments=2)
    df1 = spark.createDataFrame(list(BATCH1.items()), "doc_key string, text string")
    b.build(df1, key_col="doc_key", text_col="text")
    _check_against_oracle(spark, path, BATCH1)

    df2 = spark.createDataFrame(list(BATCH2.items()), "doc_key string, text string")
    meta = b.append(df2)
    assert meta["generation"] == 2
    assert meta["docs_count"] == len(BATCH1) + len(BATCH2)
    # global stats exact across appends -> scores equal single-build oracle
    _check_against_oracle(spark, path, {**BATCH1, **BATCH2})
    # segment ids are disjoint between batches
    reader = IndexReader(spark, path)
    sids = {int(r["segment_id"]) for r in reader.norms().select("segment_id").collect()}
    assert len(sids) == 4 and max(sids) >= 2


def test_append_batch_id_idempotent(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("appidem"))
    b = IndexBuilder(spark, path, num_segments=1)
    df1 = spark.createDataFrame(list(BATCH1.items()), "doc_key string, text string")
    b.build(df1, key_col="doc_key", text_col="text")
    df2 = spark.createDataFrame(list(BATCH2.items()), "doc_key string, text string")
    m1 = b.append(df2, batch_id=0)
    m2 = b.append(df2, batch_id=0)  # replay: no-op
    assert m1["generation"] == m2["generation"]
    assert m2["docs_count"] == len(BATCH1) + len(BATCH2)


def test_stream_index_available_now(spark, tmp_path):
    from iresearch_spark.streaming.ingest import stream_index

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(list(BATCH1.items()), "doc_key string, text string").write.parquet(
        src + "/p1"
    )
    spark.createDataFrame(list(BATCH2.items()), "doc_key string, text string").write.parquet(
        src + "/p2"
    )
    stream = (
        spark.readStream.schema("doc_key string, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src + "/*")
    )
    idx = str(tmp_path / "idx")
    q = stream_index(
        stream,
        idx,
        checkpoint=str(tmp_path / "ckpt"),
        key_col="doc_key",
        text_col="text",
        segments_per_batch=2,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    _check_against_oracle(spark, idx, {**BATCH1, **BATCH2})
