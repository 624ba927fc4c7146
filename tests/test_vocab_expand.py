"""Driver-cached multiterm expansion (prefix/range/wildcard over the sorted
vocab) must be result-identical to the distributed term_dict job — including
the overflow → tail-spec contract (multiterm_query.cpp:36-168 semantics)."""

import os

import numpy as np
from pyspark.sql import functions as F
import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt
from iresearch_spark.search.executor import _prefix_successor, expand_multiterm


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    words = [
        "scan", "scat", "scam", "span", "spark", "sprak", "s_a1", "s_a2",
        "sxaz", "query", "quick", "term", "terms", "merge", "zeta", "alpha",
    ]
    docs = {f"d{i:04d}": " ".join(rng.choice(words, size=15)) for i in range(120)}
    path = str(tmp_path_factory.mktemp("vexp"))
    df = spark.createDataFrame(list(docs.items()), "doc_key string, text string")
    IndexBuilder(spark, path, analyzer="simple", num_segments=3).build(
        df, key_col="doc_key", text_col="text"
    )
    return IndexReader(spark, path)


NODES = [
    flt.Prefix("s"),
    flt.Prefix("sc"),
    flt.Prefix("nope"),
    flt.Prefix("s", scored_terms_limit=2),   # overflow → tail spec
    flt.Range(low="query", high="spark", include_low=False),
    flt.Range(low=None, high="merge", include_high=True),
    flt.Range(low="term", high=None, include_low=True),
    flt.Range(low="a", high="z", scored_terms_limit=3),  # overflow
    flt.Wildcard("s_a%"),
    flt.Wildcard("s%a_"),
    flt.Wildcard("%erm"),                    # no literal prefix → full slice
    flt.Wildcard("s%", scored_terms_limit=2),  # overflow
]


@pytest.mark.parametrize("node", NODES, ids=[repr(n) for n in NODES])
def test_expansion_parity_vocab_vs_distributed(reader, node, monkeypatch):
    monkeypatch.setenv("IRS_MULTITERM_VOCAB", "0")
    base = expand_multiterm(node, reader)
    monkeypatch.delenv("IRS_MULTITERM_VOCAB")
    fast = expand_multiterm(node, reader)
    assert fast == base, node


def test_search_parity_overflow_tail(reader, monkeypatch):
    """End-to-end: an overflowing prefix (scored tail stays in-kernel) ranks
    identically through both expansion paths."""
    f = flt.Prefix("s", scored_terms_limit=2)
    monkeypatch.setenv("IRS_MULTITERM_VOCAB", "0")
    base = [(r["doc_key"], round(r["score"], 10))
            for r in Searcher(reader).search(f, k=20).collect()]
    monkeypatch.delenv("IRS_MULTITERM_VOCAB")
    fast = [(r["doc_key"], round(r["score"], 10))
            for r in Searcher(reader).search(f, k=20).collect()]
    assert fast == base


def test_term_stats_parity(reader, monkeypatch):
    """Driver-cached (df, ttf) lookups == the distributed term_dict job,
    including absent terms (no entry, not a zero entry)."""
    terms = ["scan", "spark", "zeta", "absent_term", "query"]
    monkeypatch.setenv("IRS_STATS_VOCAB", "0")
    base = reader.term_stats(terms)
    monkeypatch.delenv("IRS_STATS_VOCAB")
    fast = reader.term_stats(terms)
    assert fast == base
    assert "absent_term" not in fast and "scan" in fast


def test_like_regex_matches_spark_like(spark):
    """_like_regex (kernel-tail / fast-path matcher) agrees with Spark SQL
    LIKE on wildcards, escapes, and trailing-newline terms."""
    from iresearch_spark.search.executor import _like_regex

    terms = ["ab", "ab\n", "a_b", "a%b", "axb", "ab c", "a\\b", "50%", "50x"]
    patterns = ["ab", "a_b", "a%b", "a\\_b", "a\\%b", "50\\%", "%b", "a%"]
    df = spark.createDataFrame([(t,) for t in terms], "t string")
    for pat in patterns:
        want = {
            r["t"]
            for r in df.where(F.col("t").like(pat)).collect()
        }
        got = {t for t in terms if _like_regex(pat).match(t)}
        assert got == want, (pat, got, want)


def test_overcap_probe_skips_collect(reader, monkeypatch):
    """Above the cache cap the reader must decide via footer stats + a
    limited COUNT — never a data collect — and the caller falls back to the
    distributed expansion."""
    from iresearch_spark.index.reader import IndexReader as IR

    monkeypatch.setattr(type(reader), "FUZZY_VOCAB_MAX", 0)
    fresh = IR(reader.spark, reader.index_path)
    total = fresh._term_dict_total_rows()
    assert total is not None and total > 0  # footers readable driver-local
    assert fresh.fuzzy_vocab() is None
    assert fresh.fuzzy_vocab_sorted() is None
    # distributed paths still serve the query surface
    assert fresh.term_stats(["scan"])["scan"][0] > 0
    base = expand_multiterm(flt.Prefix("sc"), fresh)
    assert base[0]  # non-empty expansion via the distributed job


def test_prefix_successor():
    assert _prefix_successor("ab") == "ac"
    assert _prefix_successor("a" + chr(0x10FFFF)) == "b"
    assert _prefix_successor(chr(0x10FFFF)) is None
    assert _prefix_successor("") is None
    # the bound is right-open and tight: every string with the prefix sorts
    # below it, the successor itself does not carry the prefix
    assert "ab" <= "ab￿" < "ac"
