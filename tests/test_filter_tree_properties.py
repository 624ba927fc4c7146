"""Randomized boolean-filter-tree differential test: the engine's distributed
top-k must match the scalar oracle's ``eval_tree`` (tests/oracle.py) on the
FULL hit set — key set identical, every score float64-close — for arbitrary
And/Or/Not compositions with random kSum/kMax/kMin merges, min_match and
boosts (the composition plane of boolean_filter.cpp / min_match_disjunction.hpp
that hand-picked cases can't cover exhaustively).

Comparison is by the unordered ``{doc_key: score}`` map, so score ties cannot
produce flaky orderings; rank identity follows from score identity.
Derandomized so the suite is deterministic.
"""

import math
import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt
from tests.oracle import ScalarIndex
from tests.test_build_and_query import make_corpus

BOOSTS = [1.0, 0.5, 2.0]
MERGES = ["sum", "max", "min"]
# common + mid + rare + absent — exercises dense legs, empty legs, dead trees
VOCAB = ["spark", "index", "query", "scan", "fox", "crawl", "score", "zzzmissing"]

term_leaf = st.tuples(st.just("term"), st.sampled_from(VOCAB), st.sampled_from(BOOSTS))
PREFIXES = ["s", "sc", "qu", "zz"]  # wide, narrow, mid, dead expansions
prefix_leaf = st.tuples(st.just("prefix"), st.sampled_from(PREFIXES), st.sampled_from(BOOSTS))
terms_leaf = st.tuples(
    st.just("terms"),
    st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3).map(tuple),
    st.sampled_from([(1.0, 1.0, 1.0), (2.0, 0.5, 1.0)]),
    # 0 = every doc matches (terms_filter.cpp:123-133); 3 may exceed the
    # set size on 2-word sets = unreachable
    st.integers(min_value=0, max_value=3),
    st.sampled_from(BOOSTS),
)
# nested-phrase leaves, incl. slot OFFSETS (push_back(offs) gaps) — common
# word pairs so adjacency/gap matches actually occur in the Zipf corpus
phrase_leaf = st.tuples(
    st.just("phrase"),
    st.lists(st.sampled_from(["spark", "index", "query", "scan"]),
             min_size=2, max_size=2).map(tuple),
    st.sampled_from([None, (0, 0), (0, 1), (0, 2)]),
    st.sampled_from(BOOSTS),
)
leaf = st.one_of(term_leaf, prefix_leaf, terms_leaf, phrase_leaf)
excludes = st.lists(term_leaf, min_size=0, max_size=1).map(tuple)


def composite(children):
    parts = st.lists(children, min_size=1, max_size=3).map(tuple)
    and_node = st.tuples(
        st.just("and"), parts, excludes, st.sampled_from(MERGES), st.sampled_from(BOOSTS)
    )
    or_node = st.tuples(
        st.just("or"),
        parts,
        excludes,
        # 0 = all-docs collapse (boolean_filter.cpp:492-496); 3 may exceed
        # the leg count = unreachable
        st.integers(min_value=0, max_value=3),
        st.sampled_from(MERGES),
        st.sampled_from(BOOSTS),
    )
    return st.one_of(and_node, or_node)


trees = st.recursive(leaf, composite, max_leaves=6)


def to_filter(node) -> flt.Filter:
    op = node[0]
    if op == "term":
        return flt.Term(node[1], boost=node[2])
    if op == "prefix":
        return flt.Prefix(node[1], boost=node[2])
    if op == "terms":
        _, words, boosts, min_match, b = node
        return flt.Terms(
            words, min_match=min_match, boosts=boosts[: len(words)], boost=b
        )
    if op == "phrase":
        _, words, offsets, b = node
        return flt.Phrase(words, offsets=offsets, boost=b)
    if op == "and":
        _, parts, exc, merge, boost = node
        all_parts = tuple(to_filter(p) for p in parts) + tuple(
            flt.Not(to_filter(e)) for e in exc
        )
        return flt.And(all_parts, merge=merge, boost=boost)
    if op == "or":
        _, parts, exc, min_match, merge, boost = node
        all_parts = tuple(to_filter(p) for p in parts) + tuple(
            flt.Not(to_filter(e)) for e in exc
        )
        return flt.Or(all_parts, min_match=min_match, merge=merge, boost=boost)
    raise ValueError(node)


@pytest.fixture(scope="module")
def tree_built(spark, tmp_path_factory):
    docs = make_corpus()
    path = str(tmp_path_factory.mktemp("tree_idx"))
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_key string, text string"
    )
    IndexBuilder(spark, path, analyzer="simple", num_segments=3).build(
        df, key_col="doc_key", text_col="text"
    )
    # sum_of_terms phrase stats: a BARE phrase leaf then scores identically
    # to the in-kernel nested-phrase mode the oracle models (root exact-df
    # phrase scoring has its own dedicated suites)
    return (
        Searcher(IndexReader(spark, path), phrase_scoring="sum_of_terms"),
        ScalarIndex(docs),
    )


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=trees)
def test_tree_matches_scalar_oracle(tree_built, tree):
    searcher, oracle = tree_built
    expect = oracle.eval_tree(tree)
    rows = searcher.search(to_filter(tree), k=10**6).collect()
    got = {r["doc_key"]: r["score"] for r in rows}
    assert got.keys() == expect.keys(), (
        sorted(got.keys() - expect.keys())[:5],
        sorted(expect.keys() - got.keys())[:5],
    )
    for k, v in got.items():
        assert math.isclose(v, expect[k], rel_tol=1e-9, abs_tol=1e-12), (k, v, expect[k])


def test_pure_negation_all_docs_base(tree_built):
    """And with ONLY Not children: the all-docs base (boolean_filter.cpp
    Not-grouping) — matches every live doc not containing the term."""
    searcher, oracle = tree_built
    rows = searcher.search(flt.And((flt.Not(flt.Term("spark")),)), k=10**6).collect()
    got = {r["doc_key"] for r in rows}
    expect = {k for k in oracle.keys if not oracle.tf[k].get("spark")}
    assert got == expect


BATCH_TREES = {
    "t_term": ("term", "spark", 1.0),
    "t_boost": ("term", "scan", 2.0),
    "t_prefix": ("prefix", "s", 1.0),
    "t_and_not": ("and", (("term", "spark", 1.0), ("term", "scan", 1.0)),
                  (("term", "fox", 1.0),), "sum", 1.0),
    "t_or_mm": ("or", (("term", "spark", 1.0), ("term", "index", 1.0),
                       ("term", "query", 0.5)), (), 2, "sum", 1.0),
    "t_or_not_max": ("or", (("term", "crawl", 1.0), ("prefix", "sc", 1.0)),
                     (("term", "zzzmissing", 1.0),), 1, "max", 0.5),
    "t_nested": ("and", (("or", (("term", "spark", 1.0), ("term", "fox", 1.0)),
                          (), 1, "sum", 1.0), ("term", "scan", 1.0)),
                 (), "min", 2.0),
}


def test_batch_path_matches_interactive(tree_built):
    """search_many (PreparedBatch: union postings scan + in-kernel per-plan
    pruning) must produce the same full hit set and scores as per-query
    interactive search for composed trees — the two execution paths share
    semantics, not code path."""
    searcher, _ = tree_built
    batch = searcher.search_many(
        {name: to_filter(t) for name, t in BATCH_TREES.items()}, k=10**6
    ).collect()
    by_q: dict[str, dict] = {}
    for r in batch:
        by_q.setdefault(r["query"], {})[(r["segment_id"], r["doc_id"])] = r["score"]
    for name, t in BATCH_TREES.items():
        solo = {
            (r["segment_id"], r["doc_id"]): r["score"]
            for r in searcher.search(to_filter(t), k=10**6).collect()
        }
        got = by_q.get(name, {})
        assert got.keys() == solo.keys(), (name, len(got), len(solo))
        for key, v in got.items():
            assert math.isclose(v, solo[key], rel_tol=1e-9, abs_tol=1e-12), (name, key)


# --------------------------------------------------------------------------
# mixed-field trees: each term leaf carries a field tag; the engine must
# score every leaf against its OWN field's (df, dl, avgdl) — the per-field
# norms context of mixed plans (bm25.cpp:283-299 per-field stats)
# --------------------------------------------------------------------------

from tests.oracle import eval_composite

F_VOCAB = ["spark", "scan", "merge", "alpha", "beta", "common", "zzzmissing"]
f_leaf = st.tuples(
    st.just("term"),
    st.sampled_from(F_VOCAB),
    st.sampled_from(BOOSTS),
    st.sampled_from(["body", "title"]),
)
f_excludes = st.lists(f_leaf, min_size=0, max_size=1).map(tuple)


def f_composite(children):
    parts = st.lists(children, min_size=1, max_size=3).map(tuple)
    return st.one_of(
        st.tuples(st.just("and"), parts, f_excludes, st.sampled_from(MERGES),
                  st.sampled_from(BOOSTS)),
        st.tuples(st.just("or"), parts, f_excludes, st.integers(1, 3),
                  st.sampled_from(MERGES), st.sampled_from(BOOSTS)),
    )


f_trees = st.recursive(f_leaf, f_composite, max_leaves=5)


def to_filter_fielded(node) -> flt.Filter:
    op = node[0]
    if op == "term":
        return flt.Term(node[1], boost=node[2], field=node[3])
    if op == "and":
        _, parts, exc, merge, boost = node
        ps = tuple(to_filter_fielded(p) for p in parts) + tuple(
            flt.Not(to_filter_fielded(e)) for e in exc
        )
        return flt.And(ps, merge=merge, boost=boost)
    _, parts, exc, min_match, merge, boost = node
    ps = tuple(to_filter_fielded(p) for p in parts) + tuple(
        flt.Not(to_filter_fielded(e)) for e in exc
    )
    return flt.Or(ps, min_match=min_match, merge=merge, boost=boost)


@pytest.fixture(scope="module")
def two_field_built(spark, tmp_path_factory):
    import numpy as np

    rng = np.random.default_rng(31)
    body_docs, title_docs, rows = {}, {}, []
    for i in range(200):
        key = f"doc{i:05d}"
        body = " ".join(rng.choice(F_VOCAB[:6], size=int(rng.integers(4, 30))))
        title = " ".join(rng.choice(F_VOCAB[:6], size=int(rng.integers(2, 6))))
        body_docs[key], title_docs[key] = body, title
        rows.append((key, body, title))
    path = str(tmp_path_factory.mktemp("two_field_tree"))
    df = spark.createDataFrame(rows, "doc_key string, body string, title string")
    IndexBuilder(spark, path, num_segments=3).build(
        df, key_col="doc_key",
        fields=(("body", "body", "simple"), ("title", "title", "simple")),
    )
    oracles = {"body": ScalarIndex(body_docs), "title": ScalarIndex(title_docs)}
    all_keys = sorted(body_docs)
    return Searcher(IndexReader(spark, path)), oracles, all_keys


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=f_trees)
def test_mixed_field_tree_matches_oracle(two_field_built, tree):
    searcher, oracles, all_keys = two_field_built
    expect = eval_composite(tree, lambda n: oracles[n[3]].eval_leaf(n), all_keys)
    rows = searcher.search(to_filter_fielded(tree), k=10**6).collect()
    got = {r["doc_key"]: r["score"] for r in rows}
    assert got.keys() == expect.keys(), (
        sorted(got.keys() - expect.keys())[:5],
        sorted(expect.keys() - got.keys())[:5],
    )
    for k, v in got.items():
        assert math.isclose(v, expect[k], rel_tol=1e-9, abs_tol=1e-12), (k, v, expect[k])
