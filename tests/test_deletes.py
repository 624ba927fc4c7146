"""Deletes / document_mask: immediate masking, stale-stats semantics,
consolidation purge with renumbering (merge_writer doc_map)."""

import numpy as np
import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt
from iresearch_spark.index.consolidate import consolidate
from iresearch_spark.index.deletes import delete_docs
from tests.oracle import ScalarIndex

DOCS = {
    f"k{i:03d}": t
    for i, t in enumerate(
        [
            "spark scan merge fast",
            "scan scan table slow",
            "merge sort scan batch",
            "query plan filter scan",
            "fast slow spark merge",
            "table scan index spark",
            "window batch stream scan",
            "sort merge join hash",
            "scan spark spark merge",
            "filter scan window table",
        ]
    )
}
DELETED = ["k001", "k004", "k006"]


@pytest.fixture()
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("delidx"))
    df = spark.createDataFrame(list(DOCS.items()), "doc_key string, text string")
    IndexBuilder(spark, path, num_segments=3).build(df, key_col="doc_key", text_col="text")
    reader = IndexReader(spark, path)
    delete_docs(reader, DELETED)
    return IndexReader(spark, path)  # reopen to see gen+1


def live_expected(term):
    """Oracle: stats over ALL docs (stale until purge), matches masked."""
    oracle = ScalarIndex(DOCS)
    return [(k, s) for k, s in oracle.term_query(term, k=100) if k not in DELETED]


def test_deletes_mask_term_query(spark, idx):
    s = Searcher(idx)
    got = [(r["doc_key"], r["score"]) for r in s.search(flt.Term("scan"), k=100).collect()]
    exp = live_expected("scan")
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gk, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9


def test_deletes_mask_all_and_batch(spark, idx):
    s = Searcher(idx)
    alive = {k for k in DOCS if k not in DELETED}
    got = {r["doc_key"] for r in s.search(flt.All(), k=100).collect()}
    assert got == alive
    docs = idx.docs().select("segment_id", "doc_id", "doc_key")
    many = (
        s.search_many({"q": flt.Term("scan")}, k=100)
        .join(docs, ["segment_id", "doc_id"])
        .collect()
    )
    assert {r["doc_key"] for r in many} == {k for k, _ in live_expected("scan")}


def test_deletes_mask_phrase(spark, idx):
    s = Searcher(idx)
    got = {r["doc_key"] for r in s.search(flt.Phrase(("spark", "scan")), k=100).collect()}
    exp = {
        k
        for k, t in DOCS.items()
        if "spark scan" in t and k not in DELETED
    }
    assert got == exp


def test_consolidate_purges_deletes(spark, idx):
    s0 = Searcher(idx)
    before = [
        (r["doc_key"], round(r["score"], 10))
        for r in s0.search(flt.Term("scan"), k=100).collect()
    ]
    meta = consolidate(idx)  # full merge -> purge
    assert "deletes" not in meta["tables"]
    reader2 = IndexReader(spark, idx.index_path)
    # stats recomputed over LIVE docs only -> oracle over the live corpus
    live = {k: t for k, t in DOCS.items() if k not in DELETED}
    oracle = ScalarIndex(live)
    s = Searcher(reader2)
    got = [(r["doc_key"], r["score"]) for r in s.search(flt.Term("scan"), k=100).collect()]
    exp = oracle.term_query("scan", k=100)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gk, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9
    # doc ids are dense 1-based again
    rows = reader2.docs().select("segment_id", "doc_id").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment_id"], []).append(r["doc_id"])
    for sid, ids in by_seg.items():
        assert sorted(ids) == list(range(1, len(ids) + 1))
    # positions survived the purge: phrase query still works
    got_p = {r["doc_key"] for r in s.search(flt.Phrase(("spark", "scan")), k=100).collect()}
    assert got_p == {k for k, t in live.items() if "spark scan" in t}


def test_delete_then_more_deletes_accumulate(spark, idx):
    delete_docs(idx, ["k000"])
    r2 = IndexReader(spark, idx.index_path)
    s = Searcher(r2)
    got = {r["doc_key"] for r in s.search(flt.All(), k=100).collect()}
    assert got == {k for k in DOCS if k not in (*DELETED, "k000")}


def test_policy_suite(spark, idx):
    """Every consolidation policy returns a contiguous run (or []) and
    consolidate() accepts it."""
    from iresearch_spark.index import consolidate as cz

    for picked in (
        cz.pick_bytes(idx, threshold=2.0),
        cz.pick_bytes_accum(idx, max_bytes=1 << 30),
        cz.pick_docs_fill(idx, min_fill=0.99),  # only segments holding deletes
        cz.pick_tier(idx),
        cz.pick_count(idx, target_segments=1),
        cz.pick_small_segments(idx, max_docs=1 << 30),
    ):
        if picked:
            assert picked == list(range(picked[0], picked[-1] + 1))
    # docs_fill(<1) flags only segments that hold deleted docs
    flagged = cz.pick_docs_fill(idx, min_fill=0.99)
    dels = {int(r["segment_id"]) for r in idx.deletes().collect()}
    assert set(flagged) <= dels
