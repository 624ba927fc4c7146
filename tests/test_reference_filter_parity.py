"""Replays of the reference's FILTER test expectations (selection semantics:
which docs match) on the reference's own test corpora.

This extends the scorer rank-parity suite (test_reference_rank_parity.py)
to the filter test families: every (query, expected doc-id set) pair below
is transcribed from the reference's CheckQuery calls, and the corpus is the
reference's own resource file recreated inline. Doc ids are 1-based
insertion order, exactly the reference's sequential-segment ids
(type_limits.hpp:62-75: doc 0 invalid, first inserted doc = 1).

Pinned here:

* ``levenshtein_filter_test.cpp`` TEST_P(by_edit_distance_test_case,
  test_filter) + test_order over ``tests/resources/
  levenshtein_sequential.json`` — plain Levenshtein, Damerau (OSA), the
  exact-prefix variant, the ``max_terms`` selection cap (0 = UNLIMITED,
  ties to the larger term per top_terms_collector.hpp:64-69), and the
  default parametric-description provider's distance limits (d <= 4, and
  d <= 3 with transpositions; anything above matches NOTHING —
  levenshtein_default_pdp.hpp:24-28, levenshtein_filter.cpp:71-75).
"""

import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt

# tests/resources/levenshtein_sequential.json: seq -> title (the indexed
# text field; one single-token title per doc, doc id = seq + 1)
LEV_CORPUS = {
    0: "aaaaaaaaa", 1: "bbbbaaaaa", 2: "ababababa", 3: "bababababa",
    4: "aaaaaa", 5: "abcdbacd", 6: "aaaaaa", 7: "aaaaaabbb",
    8: "aaabbbaaa", 9: "aaabbbaa", 10: "aaaaaaaaaa", 11: "addaabbbbc",
    12: "aaaaaa", 13: "bbbbbb", 14: "abcabc", 15: "aaaaa",
    16: "ababab", 17: "baabba", 18: "aaaacc", 19: "ccaacc",
    20: "acaaaaa", 21: "aaabaacaaa", 22: "aaaccccbcd", 23: "aaabcdef",
    24: "aabadcfe", 25: "cccaaaaccc", 26: "aa", 27: "a",
    28: "b", 29: "bca", 30: "def", 31: "aaaw",
    32: "aaaaaaaaaaaaaaaa", 33: "bbbbbbb",
}


@pytest.fixture(scope="module")
def lev_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("refpar_lev"))
    rows = [(str(seq + 1), title) for seq, title in LEV_CORPUS.items()]
    df = spark.createDataFrame(rows, "doc_key string, text string")
    IndexBuilder(spark, path, analyzer="simple", num_segments=1).build(
        df, key_col="doc_key", text_col="text"
    )
    return IndexReader(spark, path)


def matched(index, f):
    s = Searcher(index)
    return sorted(int(r["doc_key"]) for r in s.search(f, k=100).collect())


# (term, max_distance, max_terms, with_transpositions, prefix, expected docs)
# transcribed 1:1 from levenshtein_filter_test.cpp test_filter (l:320-505)
# and test_order (l:148-318).
LEV_CASES = [
    # empty target, d=0 — matches nothing (no empty term in the dict)
    ("", 0, 0, False, "", []),
    # --- exact-prefix variant (levenshtein_filter.cpp:241-265) -------------
    ("", 0, 1024, False, "aaaw", [32]),
    ("w", 0, 1024, False, "aaa", [32]),
    ("w", 0, 1024, True, "aaa", [32]),
    ("", 0, 1024, False, "", []),
    ("aa", 1, 1024, False, "aaabbba", [9, 10]),
    ("", 1, 1024, False, "", [28, 29]),
    ("ca", 2, 1024, False, "b", [29, 30]),
    ("aa", 2, 1024, False, "aa", [5, 7, 13, 16, 19, 27, 32]),
    ("", 3, 1024, False, "aaa", [5, 7, 13, 16, 19, 32]),
    ("", 3, 1024, True, "aaa", [5, 7, 13, 16, 19, 32]),
    # --- plain Levenshtein --------------------------------------------------
    ("aa", 0, 1024, False, "", [27]),
    ("aa", 0, 0, False, "", [27]),
    ("aa", 0, 10, False, "", [27]),
    ("ababab", 0, 10, False, "", [17]),
    ("ababab", 0, 0, False, "", [17]),
    ("", 1, 1024, False, "", [28, 29]),
    ("", 1, 0, False, "", [28, 29]),
    ("", 1, 10, False, "", [28, 29]),  # test_order l:252
    ("", 1, 1, False, "", [29]),  # max_terms=1 keeps the LARGER tied term
    ("aa", 1, 1024, False, "", [27, 28]),
    ("aa", 1, 0, False, "", [27, 28]),
    ("ababab", 1, 1024, False, "", [17]),
    ("", 2, 1024, False, "", [27, 28, 29]),
    ("", 2, 0, False, "", [27, 28, 29]),
    ("", 2, 1, False, "", [29]),
    ("", 2, 2, False, "", [28, 29]),  # the two d=1 terms outrank the d=2 one
    ("aa", 2, 1024, False, "", [27, 28, 29, 30, 32]),
    ("aa", 2, 0, False, "", [27, 28, 29, 30, 32]),
    ("ababab", 2, 1024, False, "", [17]),
    ("ababab", 2, 0, False, "", [17]),
    ("", 3, 1024, False, "", [27, 28, 29, 30, 31]),
    ("", 3, 0, False, "", [27, 28, 29, 30, 31]),
    ("aaaa", 3, 10, False, "", [5, 7, 13, 16, 17, 18, 19, 21, 27, 28, 30, 32]),
    ("aaaa", 3, 0, False, "", [5, 7, 13, 16, 17, 18, 19, 21, 27, 28, 30, 32]),
    ("ababab", 3, 1024, False, "", [3, 5, 7, 13, 14, 15, 16, 17, 32]),
    ("ababab", 3, 0, False, "", [3, 5, 7, 13, 14, 15, 16, 17, 32]),
    ("", 4, 1024, False, "", [27, 28, 29, 30, 31, 32]),
    ("", 4, 0, False, "", [27, 28, 29, 30, 31, 32]),
    ("ababab", 4, 1024, False, "",
     [3, 4, 5, 6, 7, 10, 13, 14, 15, 16, 17, 18, 19, 21, 27, 30, 32, 34]),
    ("ababab", 4, 0, False, "",
     [3, 4, 5, 6, 7, 10, 13, 14, 15, 16, 17, 18, 19, 21, 27, 30, 32, 34]),
    # default provider supports Levenshtein only up to distance 4
    ("", 5, 1024, False, "", []),
    ("", 5, 0, False, "", []),
    ("", 6, 1024, False, "", []),
    # --- Damerau-Levenshtein (OSA) ------------------------------------------
    ("aa", 0, 1024, True, "", [27]),
    ("aa", 0, 0, True, "", [27]),
    ("ababab", 0, 1024, True, "", [17]),
    ("", 1, 1024, True, "", [28, 29]),
    ("", 1, 0, True, "", [28, 29]),
    ("aa", 1, 1024, True, "", [27, 28]),
    ("ababab", 1, 1024, True, "", [17]),
    ("aa", 2, 1024, True, "", [27, 28, 29, 30, 32]),
    ("aa", 2, 0, True, "", [27, 28, 29, 30, 32]),
    ("ababab", 2, 1024, True, "", [17, 18]),  # "baabba" via transposition
    ("ababab", 2, 0, True, "", [17, 18]),
    ("", 3, 1024, True, "", [27, 28, 29, 30, 31]),
    ("ababab", 3, 1024, True, "", [3, 5, 7, 13, 14, 15, 16, 17, 18, 32]),
    ("ababab", 3, 0, True, "", [3, 5, 7, 13, 14, 15, 16, 17, 18, 32]),
    # ... and Damerau only up to distance 3
    ("", 4, 1024, True, "", []),
    ("", 4, 0, True, "", []),
    ("", 5, 1024, True, "", []),
]


@pytest.mark.parametrize("term,maxd,max_terms,transpose,prefix,expected", LEV_CASES)
def test_by_edit_distance_reference_selection(
    lev_index, term, maxd, max_terms, transpose, prefix, expected
):
    f = flt.Fuzzy(
        term,
        max_distance=maxd,
        max_terms=max_terms,
        with_transpositions=transpose,
        prefix=prefix,
    )
    assert matched(lev_index, f) == expected


def test_by_edit_distance_distributed_path_same_selection(
    lev_index, monkeypatch
):
    """The over-cap (distributed tlen/charmask prefilter + pandas-UDF DP)
    path must make the same selections as the driver-cached fast path on a
    sample of the harder cases above."""
    monkeypatch.setattr(lev_index, "FUZZY_VOCAB_MAX", 0)
    saved_cache = dict(lev_index._vocab_cache)
    lev_index._vocab_cache.clear()
    try:
        for term, maxd, max_terms, transpose, prefix, expected in [
            ("aaaa", 3, 10, False, "", [5, 7, 13, 16, 17, 18, 19, 21, 27, 28, 30, 32]),
            ("ababab", 2, 1024, True, "", [17, 18]),
            ("aa", 2, 1024, False, "aa", [5, 7, 13, 16, 19, 27, 32]),
            ("", 1, 1024, False, "", [28, 29]),
            ("", 5, 1024, False, "", []),
        ]:
            f = flt.Fuzzy(
                term,
                max_distance=maxd,
                max_terms=max_terms,
                with_transpositions=transpose,
                prefix=prefix,
            )
            assert matched(lev_index, f) == expected, (term, maxd, transpose, prefix)
    finally:
        lev_index._vocab_cache.clear()
        lev_index._vocab_cache.update(saved_cache)
