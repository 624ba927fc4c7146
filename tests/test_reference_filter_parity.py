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


# ---------------------------------------------------------------------------
# prefix_filter_test.cpp by_prefix_sequential (simple_sequential.json) and
# wildcard_filter_test.cpp simple_sequential (simple_sequential_utf8.json),
# and range_filter_test.cpp by_range_sequential (simple_sequential.json).
#
# The corpora are keyword-field docs (one term per present field, missing
# JSON fields absent from the doc); fields are indexed with the identity
# analyzer `norm:none`. Doc ids are again 1-based insertion order.
# ---------------------------------------------------------------------------

# (seq, name, duplicated, prefix, utf8); "same" is "xyz" on every doc.
# tests/resources/simple_sequential_utf8.json; simple_sequential.json is the
# same corpus minus the utf8 values and minus seq 9/10's prefix values.
UTF8_SEQ = [
    (0, 'A', 'abcd', 'abcd', 'пуй'),
    (1, 'B', 'vczc', None, 'хублот'),
    (2, 'C', 'vczc', None, 'проглот'),
    (3, 'D', None, 'abcde', None),
    (4, 'E', 'abcd', None, None),
    (5, 'F', None, None, None),
    (6, 'G', None, None, None),
    (7, 'H', 'vczc', None, None),
    (8, 'I', None, 'bcd', None),
    (9, 'J', None, 'ab\\%', None),
    (10, 'K', 'abcd', 'ab\\\\%', None),
    (11, 'L', None, None, None),
    (12, 'M', None, None, None),
    (13, 'N', 'vczc', None, 'обама'),
    (14, 'O', None, None, None),
    (15, 'P', None, 'abde', None),
    (16, 'Q', 'vczc', None, 'трамп'),
    (17, 'R', None, None, None),
    (18, 'S', 'vczc', None, None),
    (19, 'T', None, None, None),
    (20, 'U', 'abcd', 'abc', None),
    (21, 'V', None, None, None),
    (22, 'W', None, None, None),
    (23, 'X', 'vczc', 'bateradsfsfasdf', 'меркель'),
    (24, 'Y', None, None, None),
    (25, 'Z', None, 'abcdrer', 'вий'),
    (26, '~', 'abcd', None, None),
    (27, '!', None, None, None),
    (28, '@', None, 'ahtrtrt', None),
    (29, '#', None, None, None),
    (30, '$', 'abcd', 'abcy', None),
    (31, '%', None, 'abcy', None),
]

SIMPLE_SEQ = [
    (seq, name, dup, None if seq in (9, 10) else pfx, None)
    for seq, name, dup, pfx, _ in UTF8_SEQ
]

KEYWORD_FIELDS = (
    ("name", "name", "norm:none"),
    ("same", "same", "norm:none"),
    ("duplicated", "duplicated", "norm:none"),
    ("prefix", "prefix", "norm:none"),
    ("utf8", "utf8", "norm:none"),
)


def _build_seq(spark, path, rows):
    df = spark.createDataFrame(
        [
            (str(seq + 1), name, "xyz", dup, pfx, u8)
            for seq, name, dup, pfx, u8 in rows
        ],
        "doc_key string, name string, same string, duplicated string, "
        "prefix string, utf8 string",
    )
    IndexBuilder(spark, path, analyzer="simple", num_segments=1).build(
        df, key_col="doc_key", fields=KEYWORD_FIELDS
    )
    return IndexReader(spark, path)


@pytest.fixture(scope="module")
def seq_kw_index(spark, tmp_path_factory):
    return _build_seq(
        spark, str(tmp_path_factory.mktemp("refpar_seq_kw")), SIMPLE_SEQ
    )


@pytest.fixture(scope="module")
def utf8_kw_index(spark, tmp_path_factory):
    return _build_seq(
        spark, str(tmp_path_factory.mktemp("refpar_utf8_kw")), UTF8_SEQ
    )


ALL32 = list(range(1, 33))

# (field, prefix, expected) — prefix_filter_test.cpp:150-230
PREFIX_CASES = [
    ("same1", "xyz", []),  # invalid field
    ("same", "xyz_invalid", []),  # invalid prefix
    ("same", "xyz", ALL32),
    # empty prefix matches every doc HAVING the field (not every doc)
    ("duplicated", "", [1, 2, 3, 5, 8, 11, 14, 17, 19, 21, 24, 27, 31]),
    ("duplicated", "a", [1, 5, 11, 21, 27, 31]),
    ("name", "!", [28]),
    ("prefix", "b", [9, 24]),
    ("duplicated", "vcz", [2, 3, 8, 14, 17, 19, 24]),
    ("prefix", "abc", [1, 4, 21, 26, 31, 32]),
    ("prefix", "bateradsfsfasdf", [24]),
]


@pytest.mark.parametrize("field,prefix,expected", PREFIX_CASES)
def test_by_prefix_reference_selection(seq_kw_index, field, prefix, expected):
    f = flt.Prefix(prefix, field=field)
    assert matched(seq_kw_index, f) == expected


# (low, high, include_low, include_high, expected) over field "name" —
# range_filter_test.cpp by_range_sequential:620-1005. UNBOUNDED -> None.
RANGE_NAME_CASES = [
    (None, None, True, True, ALL32),  # no bounds: every doc with the field
    ("", None, True, True, ALL32),  # ["";..)
    ("", None, False, True, ALL32),  # ("";..)
    ("", "", True, True, []),  # ["";""]
    ("A", None, True, True, list(range(1, 28))),  # [A;..) -> A..Z, ~
    ("A", None, False, True, list(range(2, 28))),  # (A;..)
    (None, "C", True, False, [1, 2, 28, 29, 30, 31, 32]),  # (..;C)
    (None, "C", True, True, [1, 2, 3, 28, 29, 30, 31, 32]),  # (..;C]
    ("A", "C", True, True, [1, 2, 3]),
    ("A", "B", True, True, [1, 2]),
    ("A", "B", True, False, [1]),
    ("A", "B", False, True, [2]),
    ("A", "B", False, False, []),
    ("A", "C", True, False, [1, 2]),
    ("A", "C", False, True, [2, 3]),
    ("A", "C", False, False, [2]),
    ("C", "A", True, True, []),  # inverted range
    ("~", None, True, True, [27]),  # [~;..]
    ("~", None, False, True, []),  # (~;..]
    ("a", None, False, True, [27]),  # (a;..] -> only ~ sorts above 'a'
    (None, "a", True, True, [i for i in ALL32 if i != 27]),  # [..;a]
    (None, "a", True, False, [i for i in ALL32 if i != 27]),  # [..;a)
    ("\x7f", None, False, True, []),  # (DEL;..]
]


@pytest.mark.parametrize("low,high,il,ih,expected", RANGE_NAME_CASES)
def test_by_range_reference_selection(seq_kw_index, low, high, il, ih, expected):
    f = flt.Range(low=low, high=high, include_low=il, include_high=ih, field="name")
    assert matched(seq_kw_index, f) == expected


def test_by_range_invalid_field(seq_kw_index):
    assert matched(seq_kw_index, flt.Range(field="invalid_name")) == []


# (field, pattern, expected) — wildcard_filter_test.cpp simple_sequential
# (l:265-460) over simple_sequential_utf8.json. Patterns are the reference's
# actual pattern bytes (C++ escaping already resolved): \ escapes the next
# char, % = any run, _ = exactly one UTF-8 character.
WILDCARD_CASES = [
    ("same1", "xyz%", []),  # invalid field
    ("same", "xyz_invalid%", []),  # invalid prefix
    ("duplicated", "", []),  # empty pattern matches nothing
    # match all 32 (every "same" value is the 3-char term "xyz")
    ("same", "%", ALL32),
    ("same", "___", ALL32),
    ("same", "%_", ALL32),
    ("same", "_%", ALL32),
    ("same", "x_%", ALL32),
    ("same", "__z", ALL32),
    ("same", "%_z", ALL32),
    ("same", "x%_", ALL32),
    ("same", "x_z", ALL32),
    ("same", "x%z", ALL32),
    ("same", "_yz", ALL32),
    ("same", "%yz", ALL32),
    ("same", "xyz", ALL32),
    # escaped specials match literally (and nothing here matches)
    ("prefix", r"ab\%", []),
    ("same", r"x\_z", []),
    ("same", r"x\%z", []),
    ("same", "_", []),
    # escaped backslash then wildcard: terms starting "ab\"
    ("prefix", r"ab\\%", [10, 11]),
    ("prefix", r"ab\\\%", [10]),  # literal ab\%
    ("prefix", r"ab\\\\%", [11]),  # literal ab\\ then wildcard
    ("same", "xyz%", ALL32),
    ("duplicated", "v_z%", [2, 3, 8, 14, 17, 19, 24]),
    ("duplicated", "v%c", [2, 3, 8, 14, 17, 19, 24]),
    ("duplicated", "v%%%%%c", [2, 3, 8, 14, 17, 19, 24]),
    ("duplicated", "%c", [2, 3, 8, 14, 17, 19, 24]),
    ("duplicated", "%_c", [2, 3, 8, 14, 17, 19, 24]),
    ("prefix", "%c%", [1, 4, 9, 21, 26, 31, 32]),
    ("prefix", "%c%%", [1, 4, 9, 21, 26, 31, 32]),
    ("prefix", "%%%%c%%", [1, 4, 9, 21, 26, 31, 32]),
    ("prefix", "%%c%", [1, 4, 9, 21, 26, 31, 32]),
    ("prefix", "%%c%%", [1, 4, 9, 21, 26, 31, 32]),
    ("duplicated", "a%", [1, 5, 11, 21, 27, 31]),
    ("name", "!%", [28]),
    ("prefix", "b%", [9, 24]),
    ("duplicated", "vcz%", [2, 3, 8, 14, 17, 19, 24]),
    ("duplicated", "vcz%%%%%", [2, 3, 8, 14, 17, 19, 24]),
    ("prefix", "abc%", [1, 4, 21, 26, 31, 32]),
    ("prefix", "abc%%", [1, 4, 21, 26, 31, 32]),
    ("prefix", "a%d%", [1, 4, 16, 26]),
    ("prefix", "a%d%%", [1, 4, 16, 26]),
    # UTF-8 patterns: _ and the literal tail are CHARACTER-wise
    ("utf8", "%й", [1, 26]),
    ("utf8", "%%й", [1, 26]),
    ("utf8", "в%й", [26]),
    ("utf8", "в%%й", [26]),
    ("utf8", "п%", [1, 3]),
    ("utf8", "п%%", [1, 3]),
    ("prefix", "bateradsfsfasdf", [24]),  # whole word
]


@pytest.mark.parametrize("field,pattern,expected", WILDCARD_CASES)
def test_by_wildcard_reference_selection(utf8_kw_index, field, pattern, expected):
    f = flt.Wildcard(pattern, field=field)
    assert matched(utf8_kw_index, f) == expected
