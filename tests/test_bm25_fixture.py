"""BM25 rank-identity vs the reference scorer tests (FIXTURES.md F2).

Recreates tests/resources/simple_sequential_order.json and asserts the exact
descending-score doc orders from /root/reference/tests/search/bm25_test.cpp:
range (6,8] → {7,3,0,1,5} (bm25_test.cpp:141), range [6,8] → {0,7,5,3,2,1}
under Norm2 (bm25_test.cpp:185-186), term "7" → {0,1,5,7} (bm25_test.cpp:540).
Run under float32 (reference score_t) and float64.
"""

import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt

# seq -> token array (tests/resources/simple_sequential_order.json)
FIXTURE = {
    0: ["6", "7", "7", "3", "7", "3"],
    1: ["4", "2", "4", "5", "2", "3", "4", "7", "2", "7"],
    2: ["9", "3", "6", "4", "2"],
    3: ["9", "9", "2", "5", "2", "8", "5"],
    4: ["3", "0", "0"],
    5: ["1", "2", "9", "7", "0", "9", "3", "6"],
    6: ["2", "1", "0", "9", "5"],
    7: ["4", "3", "7", "2", "1", "2", "8", "9"],
}


@pytest.fixture(scope="module")
def fixture_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25fix"))
    rows = [(str(seq), " ".join(toks)) for seq, toks in FIXTURE.items()]
    df = spark.createDataFrame(rows, "doc_key string, text string")
    IndexBuilder(spark, path, analyzer="simple", num_segments=1).build(
        df, key_col="doc_key", text_col="text"
    )
    return IndexReader(spark, path)


def ranks(searcher, f, dtype):
    rows = searcher.search(f, k=100, dtype=dtype).collect()
    return [int(r["doc_key"]) for r in rows]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_term_7(fixture_index, dtype):
    s = Searcher(fixture_index)
    assert ranks(s, flt.Term("7"), dtype) == [0, 1, 5, 7]  # bm25_test.cpp:540


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_range_6_excl_8_incl(fixture_index, dtype):
    s = Searcher(fixture_index)
    f = flt.Range(low="6", high="8", include_low=False, include_high=True)
    assert ranks(s, f, dtype) == [7, 3, 0, 1, 5]  # bm25_test.cpp:141


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_range_6_incl_8_incl_norm2(fixture_index, dtype):
    s = Searcher(fixture_index)
    f = flt.Range(low="6", high="8")
    assert ranks(s, f, dtype) == [0, 7, 5, 3, 2, 1]  # bm25_test.cpp:185-186


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_range_6_incl_8_incl_legacy_norm(fixture_index, dtype):
    """Legacy Norm variant (norm stored as 1/sqrt(len), tf=sqrt(freq)):
    rank {7,0,5,3,2,1} (bm25_test.cpp:175-211 non-Norm2 branch)."""
    s = Searcher(fixture_index, scorer="bm25_norm")
    f = flt.Range(low="6", high="8")
    assert ranks(s, f, dtype) == [7, 0, 5, 3, 2, 1]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_tfidf_norm_range_6_excl_8_incl(fixture_index, dtype):
    """tfidf with normalize=true (tfidf_sort{true}): range (6,8] rank
    {7,0,3,1,5} (tfidf_test.cpp:86-175 test_query_norms by_range multiple) —
    the norm-free tfidf score times 1/sqrt(|doc|)."""
    s = Searcher(fixture_index, scorer="tfidf_norm")
    f = flt.Range(low="6", high="8", include_low=False, include_high=True)
    assert ranks(s, f, dtype) == [7, 0, 3, 1, 5]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_tfidf_norm_range_6_incl_8_incl(fixture_index, dtype):
    """tfidf normalize=true, range [6,8] rank {0,7,5,2,3,1}
    (tfidf_test.cpp:176-240 test_query_norms, second by_range block)."""
    s = Searcher(fixture_index, scorer="tfidf_norm")
    f = flt.Range(low="6", high="8")
    assert ranks(s, f, dtype) == [0, 7, 5, 2, 3, 1]
