"""Rank identity vs the reference's own scorer query tests — the full
extractable set of expected top-k orders from bm25_test.cpp test_query /
test_phrase and tfidf_test.cpp test_query / test_phrase (extends the F2
fixtures of tests/test_bm25_fixture.py; north rule: "matching the
reference's top-k docIDs and BM25 scores (rank-identical) on the reference
query set").

Two reference corpora, recreated verbatim:

* ``simple_sequential_order.json`` (8 docs, digit tokens) — the test_query
  scenarios.  Those tests index ``field`` via plain ``string_field`` with
  FREQ only (bm25_test.cpp:505-516) — NO norm feature — so the reference
  scorer runs its norm-free branch; ``Searcher(b=0)`` is the exact analogue
  (c1 degenerates to k, tf/(tf+k), no length normalization).  tfidf
  scenarios use ``tfidf_sort{false, true}`` (withNorms=false,
  bm25_test-style boost_as_score) = this engine's norm-free ``tfidf``.
* ``phrase_sequential.json`` (40 docs) — the test_phrase scenarios, BM25
  with ``{"b": 0}`` (bm25_test.cpp:387-389) and norm-free TFIDF
  (tfidf_test.cpp:395); ``phrase_scoring="sum_of_terms"`` is the
  reference-parity stats mode (constant idf per query, so rank order is
  mode-independent — asserted in parity mode regardless).

Tie semantics: the reference collects into a ``std::multimap<score_t, ...,
std::greater<>>`` — equal scores keep INSERTION order, which is segment
doc-id order; this engine orders by (score desc, segment_id, doc_id), the
same order for a single-segment index built in corpus order.
"""

import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt

from .test_bm25_fixture import FIXTURE  # simple_sequential_order.json

# tests/resources/phrase_sequential.json, name -> phrase (text analyzer,
# locale "C", no stopwords = lowercase whitespace tokens for this corpus)
PHRASE_FIXTURE = {
    "A": "quick brown fox jumps over the lazy dog",
    "B": "that they are a sound basis",
    "C": "we do not see eye to eye on every issue",
    "D": "that is why we are looking forward to the debate",
    "E": "as in the past",
    "F": "we will reach a mutually",
    "G": "we do not see quick brown fox",
    "H": "as in the past we are looking forward",
    "I": "quick brown fox moved forward",
    "K": "fox",
    "L": "fox brown quick",
    "M": "big brown eye",
    "N": "fox fox fox quick quick quick quick fox quick",
    "O": "jumps high jumps high hotdog",
    "P": "jumps high jumps left jumps right jumps down jumps back",
    "Q": "jumps high jumps left jumps right jumps down walks back",
    "R": "jumps high jumps left jumps right walks down walks back",
    "S": "quick quilt brown fox moved",
    "T": "quick brother fox brown moved",
    "U": "quick brown forward brother moved",
    "V": "quilt brother fox moved",
    "W": "quilt brown forward quick brother moved",
    "X": "quilt quick brother forward brother moved",
    "Y": "quilt brother forward moved",
    "Z": "the end of an endless story is a good golden google god likes "
         "gorillas and goes like a monkey",
    "PHW0": "zo_y",
    "PHW1": "_oo",
    "PHW2": "z_o",
    "PHW3": "elephant giraff_y",
    "PHW4": "elephant _iraffe",
    "PHW5": "elephant gira_fe",
    "SPWLC0": "cookies cake pie biscuit meringue cookies cake pie biscuit "
              "marshmallows paste bread",
    "SPWLC1": "cookies cake pie biskuit marshmallows cookies pie meringue",
    "SPWLC2": "cookies cake pie biscwit meringue pie biscuit paste",
    "SPWLC3": "cookies cake pie biscuet marshmallows cake meringue",
    "X0": "x0",
    "X1": "x1",
    "X2": "x2",
    "X3": "x2 x1 x2",
    "X4": "x1 x0 x2",
    "X5": "x2 x2 x2",
}

VARIADIC = flt.Phrase(
    (
        "cookies",
        flt.Prefix("ca"),
        flt.Wildcard("p_e"),
        flt.Fuzzy("biscuit", max_distance=1),
        flt.Terms(("meringue", "marshmallows")),
    )
)


@pytest.fixture(scope="module")
def seq_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("refpar_seq"))
    rows = [(str(seq), " ".join(toks)) for seq, toks in FIXTURE.items()]
    df = spark.createDataFrame(rows, "doc_key string, text string")
    IndexBuilder(spark, path, analyzer="simple", num_segments=1).build(
        df, key_col="doc_key", text_col="text", stored_cols=("doc_key",)
    )
    return IndexReader(spark, path)


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("refpar_phrase"))
    rows = [(name, text) for name, text in PHRASE_FIXTURE.items()]
    df = spark.createDataFrame(rows, "doc_key string, text string")
    IndexBuilder(spark, path, analyzer="simple", num_segments=1).build(
        df, key_col="doc_key", text_col="text"
    )
    return IndexReader(spark, path)


def ranks(searcher, f, k=100):
    return [r["doc_key"] for r in searcher.search(f, k=k).collect()]


def scored(searcher, f, k=100):
    return [(r["doc_key"], r["score"]) for r in searcher.search(f, k=k).collect()]


# --- bm25_test.cpp TEST_P(bm25_test_case, test_query) -----------------------


def test_bm25_range_both_exclusive(seq_index):
    """by_range (6,8) → {0,1,5,7} (bm25_test.cpp:854-896)."""
    s = Searcher(seq_index, b=0.0)
    f = flt.Range(low="6", high="8", include_low=False, include_high=False)
    assert ranks(s, f) == ["0", "1", "5", "7"]


def test_bm25_range_scored_terms_limit(seq_index):
    """by_range [8,9) + scored_terms_limit(1) → {3,7}
    (bm25_test.cpp:897-942)."""
    s = Searcher(seq_index, b=0.0)
    f = flt.Range(
        low="8", high="9", include_low=True, include_high=False,
        scored_terms_limit=1,
    )
    assert ranks(s, f) == ["3", "7"]


def test_bm25_or_term_disjunction_groups(seq_index):
    """Or(Term "6", Term "8") → {3,7} (df=2, equal scores) above {0,2,5}
    (df=3, equal scores) — bm25_test.cpp:658-760 (norm-free: the reference
    comments "same value in N documents"; ties then keep doc order)."""
    s = Searcher(seq_index, b=0.0)
    rows = scored(s, flt.Or((flt.Term("6"), flt.Term("8"))))
    assert [d for d, _ in rows] == ["3", "7", "0", "2", "5"]
    assert rows[0][1] == rows[1][1]                      # df=2 group tie
    assert rows[2][1] == rows[3][1] == rows[4][1]        # df=3 group tie
    assert rows[1][1] > rows[2][1]                       # strict group gap


def test_bm25_single_term_phrase_matches_term_docs(seq_index):
    """by_phrase [Term "7"] → docs {0,1,5,7} in term-query order
    (bm25_test.cpp:1071-1115: a one-slot phrase ranks like the term)."""
    s = Searcher(seq_index, b=0.0, phrase_scoring="sum_of_terms")
    assert ranks(s, flt.Phrase(("7",))) == ["0", "1", "5", "7"]


def test_bm25_all_boost_as_constant_score(seq_index):
    """all with boost 1.5 → every doc matched, every score exactly 1.5,
    doc order (bm25_test.cpp:1116-1142); boost 0 → every score 0.0
    (bm25_test.cpp:1143-1171)."""
    s = Searcher(seq_index, b=0.0)
    rows = scored(s, flt.All(boost=1.5))
    assert [d for d, _ in rows] == [str(i) for i in range(8)]
    assert all(v == 1.5 for _, v in rows)
    rows0 = scored(s, flt.All(boost=0.0))
    assert [d for d, _ in rows0] == [str(i) for i in range(8)]
    assert all(v == 0.0 for _, v in rows0)


def test_bm25_column_existence_constant_score(seq_index):
    """by_column_existence("doc_key") → every doc, score = boost (reference
    asserts 1.0 per doc then 0.0 under boost 0; bm25_test.cpp:1172-1234)."""
    s = Searcher(seq_index, b=0.0)
    rows = scored(s, flt.ColumnExists("doc_key"))
    assert [d for d, _ in rows] == [str(i) for i in range(8)]
    assert all(v == 1.0 for _, v in rows)
    rows0 = scored(s, flt.ColumnExists("doc_key", boost=0.0))
    assert [d for d, _ in rows0] == [str(i) for i in range(8)]
    assert all(v == 0.0 for _, v in rows0)


# --- tfidf_test.cpp TEST_P(tfidf_test_case, test_query) ---------------------


def test_tfidf_term(seq_index):
    """by_term "7" → {0,1,5,7} (tfidf_test.cpp:535-563)."""
    s = Searcher(seq_index, scorer="tfidf")
    assert ranks(s, flt.Term("7")) == ["0", "1", "5", "7"]


def test_tfidf_range_both_exclusive(seq_index):
    """by_range (6,8) → {0,1,5,7} (tfidf_test.cpp:864-906)."""
    s = Searcher(seq_index, scorer="tfidf")
    f = flt.Range(low="6", high="8", include_low=False, include_high=False)
    assert ranks(s, f) == ["0", "1", "5", "7"]


def test_tfidf_range_scored_terms_limit(seq_index):
    """by_range [8,9) + scored_terms_limit(1) → {3,7}
    (tfidf_test.cpp:907-952)."""
    s = Searcher(seq_index, scorer="tfidf")
    f = flt.Range(
        low="8", high="9", include_low=True, include_high=False,
        scored_terms_limit=1,
    )
    assert ranks(s, f) == ["3", "7"]


def test_tfidf_range_excl_incl(seq_index):
    """by_range (6,8] → {7,0,1,3,5} (tfidf_test.cpp:994-1043)."""
    s = Searcher(seq_index, scorer="tfidf")
    f = flt.Range(low="6", high="8", include_low=False, include_high=True)
    assert ranks(s, f) == ["7", "0", "1", "3", "5"]


def test_tfidf_range_incl_incl(seq_index):
    """by_range [6,8] (3 terms) → {0,7,5,1,3,2}
    (tfidf_test.cpp:1044-1099)."""
    s = Searcher(seq_index, scorer="tfidf")
    f = flt.Range(low="6", high="8")
    assert ranks(s, f) == ["0", "7", "5", "1", "3", "2"]


def test_tfidf_single_term_phrase(seq_index):
    """by_phrase [Term "7"] → {0,1,5,7} (tfidf_test.cpp:1100-1145)."""
    s = Searcher(seq_index, scorer="tfidf", phrase_scoring="sum_of_terms")
    assert ranks(s, flt.Phrase(("7",))) == ["0", "1", "5", "7"]


# --- test_phrase (both scorers, phrase_sequential.json) ---------------------


def test_bm25_phrase_jumps_high(phrase_index):
    """Phrase("jumps","high"), bm25 {"b":0} → O,P,Q,R
    (bm25_test.cpp:395-440; P/Q/R are an equal-score group under b=0 —
    tf=1 each — kept in doc order, O leads on tf=2)."""
    s = Searcher(phrase_index, b=0.0, phrase_scoring="sum_of_terms")
    assert ranks(s, flt.Phrase(("jumps", "high"))) == ["O", "P", "Q", "R"]


def test_bm25_phrase_variadic(phrase_index):
    """Phrase(Term cookies, Prefix ca, Wildcard p_e, Fuzzy biscuit d=1,
    Terms {meringue, marshmallows}), bm25 {"b":0} → SPWLC0..3
    (bm25_test.cpp:441-500)."""
    s = Searcher(phrase_index, b=0.0, phrase_scoring="sum_of_terms")
    assert ranks(s, VARIADIC) == ["SPWLC0", "SPWLC1", "SPWLC2", "SPWLC3"]


def test_tfidf_phrase_jumps_high(phrase_index):
    """Phrase("jumps","high"), tfidf_sort{false,true} → O,P,Q,R
    (tfidf_test.cpp:404-452)."""
    s = Searcher(phrase_index, scorer="tfidf", phrase_scoring="sum_of_terms")
    assert ranks(s, flt.Phrase(("jumps", "high"))) == ["O", "P", "Q", "R"]


def test_tfidf_phrase_variadic(phrase_index):
    """Variadic phrase, tfidf → SPWLC0..3 (tfidf_test.cpp:453-511)."""
    s = Searcher(phrase_index, scorer="tfidf", phrase_scoring="sum_of_terms")
    assert ranks(s, VARIADIC) == ["SPWLC0", "SPWLC1", "SPWLC2", "SPWLC3"]
