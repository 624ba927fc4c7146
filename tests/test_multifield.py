"""Multi-field indexing (VERDICT round-2 item 6).

Reference surface: per-document field lists (utils/index-put.cpp:258-277
indexes title+date+body), per-field postings namespaces (field_data.cpp),
per-field BM25 stats collectors (bm25.cpp:204-276) and field-scoped filters
(every by_* filter carries a field name, e.g. by_term::field).

Oracle: brute-force BM25 recomputed in numpy per field from the raw corpus.
"""

import math

import numpy as np
import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher
from iresearch_spark import filters as flt

K1, B = 1.2, 0.75


def _bm25(tf, dl, df, n, avgdl, boost=1.0):
    idf = math.log1p((n - df + 0.5) / (df + 0.5))
    return boost * (K1 + 1.0) * idf * tf / (K1 * (1 - B) + K1 * B * dl / avgdl + tf)


def _corpus(spark, n=60):
    rows = []
    for i in range(n):
        body = " ".join(
            ["scan"] * (1 + i % 3)
            + ["merge"] * (i % 2)
            + [f"w{i % 7}", "common"]
        )
        title = " ".join([f"t{i % 5}", "alpha" if i % 2 == 0 else "beta", "common"])
        rows.append((f"k{i:05d}", body, title))
    return rows, spark.createDataFrame(
        rows, "doc_key string, body string, title string"
    )


def _oracle_topk(rows, field_idx, term, k=10, field2=None, term2=None):
    """Brute-force per-field BM25 (sum across legs when a second (field, term)
    leg is given), top-k by (score desc, doc_key asc)."""
    toks = [r[field_idx].split() for r in rows]
    legs = [(field_idx, term)]
    if term2 is not None:
        legs = [(field_idx, term), (field2, term2)]
    per_field = {}
    for fi in {f for f, _ in legs}:
        ftoks = [r[fi].split() for r in rows]
        dls = [len(t) for t in ftoks]
        n = sum(1 for d in dls if d > 0)
        avgdl = sum(dls) / n
        per_field[fi] = (ftoks, dls, n, avgdl)
    scores = {}
    for fi, t in legs:
        ftoks, dls, n, avgdl = per_field[fi]
        df = sum(1 for tk in ftoks if t in tk)
        if df == 0:
            continue
        for r, tk, dl in zip(rows, ftoks, dls):
            tf = tk.count(t)
            if tf:
                scores[r[0]] = scores.get(r[0], 0.0) + _bm25(tf, dl, df, n, avgdl)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    rows, df = _corpus(spark)
    path = str(tmp_path_factory.mktemp("mf") / "idx")
    builder = IndexBuilder(spark, path, analyzer="simple", num_segments=3)
    builder.build(
        df, key_col="doc_key",
        fields=(("body", "body", "simple"), ("title", "title", "simple")),
    )
    return rows, IndexReader(spark, path)


def test_meta_and_stats_isolated(mf_index):
    rows, reader = mf_index
    assert reader.field_names == ["body", "title"]
    assert reader.is_multifield
    assert reader.default_field == "body"
    sb = reader.field_stats("body")
    st = reader.field_stats("title")
    assert sb["total_term_freq"] == sum(len(r[1].split()) for r in rows)
    assert st["total_term_freq"] == sum(len(r[2].split()) for r in rows)
    # same term, different per-field df ('common' is in every body AND title)
    tb = reader.term_stats(["common"], field="body")["common"]
    tt = reader.term_stats(["common"], field="title")["common"]
    assert tb[0] == len(rows) and tt[0] == len(rows)
    assert reader.term_stats(["alpha"], field="body") == {}
    assert reader.term_stats(["alpha"], field="title")["alpha"][0] == 30


def test_default_field_query_matches_oracle(mf_index):
    rows, reader = mf_index
    got = Searcher(reader).search(flt.Term("scan"), k=10).collect()
    want = _oracle_topk(rows, 1, "scan")
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_title_field_query_matches_oracle(mf_index):
    rows, reader = mf_index
    got = Searcher(reader).search(flt.Term("alpha", field="title"), k=10).collect()
    want = _oracle_topk(rows, 2, "alpha")
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_same_term_scores_differ_by_field(mf_index):
    rows, reader = mf_index
    s = Searcher(reader)
    body = s.search(flt.Term("common"), k=5).collect()
    title = s.search(flt.Term("common", field="title"), k=5).collect()
    # both match every doc but with different (df, dl, avgdl) → scores differ
    assert body and title
    assert abs(body[0]["score"] - title[0]["score"]) > 1e-9


def test_mixed_field_or_sums_per_field_legs(mf_index):
    rows, reader = mf_index
    got = Searcher(reader).search(
        flt.Or((flt.Term("scan"), flt.Term("alpha", field="title"))), k=10
    ).collect()
    want = _oracle_topk(rows, 1, "scan", field2=2, term2="alpha")
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_mixed_field_and_not(mf_index):
    rows, reader = mf_index
    got = Searcher(reader).search(
        flt.And((flt.Term("scan"), flt.Not(flt.Term("beta", field="title")))), k=50
    ).collect()
    keys = {r["doc_key"] for r in got}
    want = {r[0] for r in rows if "scan" in r[1].split() and "beta" not in r[2].split()}
    assert keys == want


def test_multiterm_field_scoped(mf_index):
    rows, reader = mf_index
    s = Searcher(reader)
    got = s.search(flt.Prefix("t", field="title"), k=100).collect()
    want = {r[0] for r in rows}  # every title has t<i%5>
    assert {r["doc_key"] for r in got} == want
    # prefix on body must NOT see title terms
    got_b = s.search(flt.Prefix("alpha"), k=100).collect()
    assert got_b == []


def test_batch_mixed_fields(mf_index):
    rows, reader = mf_index
    res = Searcher(reader).search_many(
        {
            "qb": flt.Term("scan"),
            "qt": flt.Term("alpha", field="title"),
            "qm": flt.Or((flt.Term("scan"), flt.Term("alpha", field="title"))),
        },
        k=10,
    )
    docs = reader.docs().select("segment_id", "doc_id", "doc_key")
    from pyspark.sql import functions as F

    got = {
        q: [(r["doc_key"], round(r["score"], 9)) for r in g]
        for q, g in (
            (q, res.where(F.col("query") == q).join(docs, ["segment_id", "doc_id"])
             .orderBy(F.desc("score"), "doc_key").collect())
            for q in ("qb", "qt", "qm")
        )
    }
    assert got["qb"] == [(k, round(s, 9)) for k, s in _oracle_topk(rows, 1, "scan")]
    assert got["qt"] == [(k, round(s, 9)) for k, s in _oracle_topk(rows, 2, "alpha")]
    assert got["qm"] == [
        (k, round(s, 9)) for k, s in _oracle_topk(rows, 1, "scan", field2=2, term2="alpha")
    ]


def test_phrase_field_scoped(mf_index):
    rows, reader = mf_index
    got = Searcher(reader).search(
        flt.Phrase(("alpha", "common"), field="title"), k=50
    ).collect()
    want = {r[0] for r in rows if "alpha common" in r[2]}
    assert {r["doc_key"] for r in got} == want
    # same phrase against the default body field matches nothing
    got_b = Searcher(reader).search(flt.Phrase(("alpha", "common")), k=50).collect()
    assert got_b == []


def test_unknown_field_matches_nothing(mf_index):
    _, reader = mf_index
    s = Searcher(reader)
    assert s.search(flt.Term("scan", field="nope"), k=5).collect() == []
    assert s.search(flt.Prefix("s", field="nope"), k=5).collect() == []


def test_consolidate_preserves_fields(spark, tmp_path):
    rows, df = _corpus(spark, n=40)
    path = str(tmp_path / "idx")
    builder = IndexBuilder(spark, path, analyzer="simple", num_segments=4)
    builder.build(
        df, key_col="doc_key",
        fields=(("body", "body", "simple"), ("title", "title", "simple")),
    )
    from iresearch_spark.index.consolidate import consolidate

    before_b = Searcher(IndexReader(spark, path)).search(flt.Term("scan"), k=10).collect()
    before_t = Searcher(IndexReader(spark, path)).search(
        flt.Term("alpha", field="title"), k=10
    ).collect()
    consolidate(IndexReader(spark, path))
    reader2 = IndexReader(spark, path)
    assert reader2.field_names == ["body", "title"]
    after_b = Searcher(reader2).search(flt.Term("scan"), k=10).collect()
    after_t = Searcher(reader2).search(flt.Term("alpha", field="title"), k=10).collect()
    assert [(r["doc_key"], round(r["score"], 9)) for r in after_b] == [
        (r["doc_key"], round(r["score"], 9)) for r in before_b
    ]
    assert [(r["doc_key"], round(r["score"], 9)) for r in after_t] == [
        (r["doc_key"], round(r["score"], 9)) for r in before_t
    ]


def test_append_multifield(spark, tmp_path):
    rows, df = _corpus(spark, n=30)
    path = str(tmp_path / "idx")
    builder = IndexBuilder(spark, path, analyzer="simple", num_segments=2)
    fields = (("body", "body", "simple"), ("title", "title", "simple"))
    half = df.where(df.doc_key < "k00015")
    rest = df.where(df.doc_key >= "k00015")
    builder.build(half, key_col="doc_key", fields=fields)
    builder.append(rest)
    reader = IndexReader(spark, path)
    # global title stats cover both generations
    st = reader.field_stats("title")
    assert st["total_term_freq"] == sum(len(r[2].split()) for r in rows)
    got = Searcher(reader).search(flt.Term("alpha", field="title"), k=30).collect()
    want = {r[0] for r in rows if "alpha" in r[2].split()}
    assert {r["doc_key"] for r in got} == want


def test_offsets_rejects_multifield(spark, tmp_path):
    # OFFS sidecar is single-'simple'-field only — fail fast at construction
    import pytest as _pytest

    b = IndexBuilder(spark, str(tmp_path / "x"), analyzer="simple", with_offsets=True)
    with _pytest.raises(ValueError):
        b._resolve_fields(None, (("a", "a", "simple"), ("b", "b", "simple")))
    with _pytest.raises(ValueError):
        b._resolve_fields(None, (("a", "a", "text_en"),))
    assert b._resolve_fields("text", None) == [("text", "text", "simple")]


def test_duplicate_and_reserved_field_names(spark, tmp_path):
    import pytest as _pytest

    b = IndexBuilder(spark, str(tmp_path / "y"), analyzer="simple")
    with _pytest.raises(ValueError):
        b._resolve_fields(None, (("a", "a"), ("a", "b")))
    with _pytest.raises(ValueError):
        b._resolve_fields(None, (("bad\x1fname", "a"),))
