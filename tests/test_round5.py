"""Round-5 unit fixtures: text-analyzer edge-ngram option.

Reference: text_token_stream.cpp:483-531 (edgeNgram options min/max/
preserveOriginal) and :1137-1204 (next_ngram emission + increment
semantics). Fixtures below hand-trace that code for each case class.
"""

import pandas as pd
import pytest

from iresearch_spark.analysis.tokenizers import get_tokenizer, text_edge_tokenize


def run(tok, text):
    return tok(pd.Series([text])).iloc[0]


def test_edge_basic_grams_and_positions():
    # 'customer' stems to 'custom' (L=6): grams 'cu','cus' at ONE position
    tok = text_edge_tokenize("en", (), 2, 3)
    ts, ps = run(tok, "customer scans")
    # 'scans' stems to 'scan' (L=4): grams 'sc','sca'
    assert ts == ["cu", "cus", "sc", "sca"]
    assert ps == [1, 1, 2, 2]  # grams of one word share its position slot


def test_edge_preserve_original_long_word():
    # L > max_gram with preserveOriginal → full word emitted LAST
    # (next_ngram: length>max branch sets ngram.it=end when preserve)
    tok = text_edge_tokenize("en", (), 2, 3, preserve_original=True)
    ts, ps = run(tok, "customer")
    assert ts == ["cu", "cus", "custom"]
    assert ps == [1, 1, 1]


def test_edge_short_word_only_under_preserve():
    # L < min_gram: nothing without preserveOriginal, the word itself with it
    tok = text_edge_tokenize("en", (), 3, 4)
    ts, ps = run(tok, "go big")  # 'go' L=2 < 3
    assert ts == ["big"] and ps == [1]  # skipped word consumed NO increment
    tok_p = text_edge_tokenize("en", (), 3, 4, preserve_original=True)
    ts, ps = run(tok_p, "go big")
    assert ts == ["go", "big"] and ps == [1, 2]


def test_edge_word_within_bounds_includes_full_word_as_gram():
    # min <= L <= max: the L-gram IS the full word (end-of-word branch),
    # no duplicate emission under preserveOriginal
    for preserve in (False, True):
        tok = text_edge_tokenize("en", (), 2, 6, preserve_original=preserve)
        ts, ps = run(tok, "custom")
        assert ts == ["cu", "cus", "cust", "custo", "custom"]
        assert ps == [1] * 5


def test_edge_applies_after_stopword_and_stem():
    # stopwords drop BEFORE gramming and never consume a position
    tok = text_edge_tokenize("en", ("the",), 2, 3)
    ts, ps = run(tok, "the customer")
    assert ts == ["cu", "cus"] and ps == [1, 1]


def test_edge_spec_parsing():
    tok = get_tokenizer("text:en,edge:2-3-p,the,of")
    assert getattr(tok, "emits_positions", False)
    ts, ps = run(tok, "the customer of it")
    # stopwords the/of dropped; custom → cu,cus,custom; it → it? L=2>=2 → 'it'
    assert ts == ["cu", "cus", "custom", "it"]
    assert ps == [1, 1, 1, 2]


def test_edge_spec_bad_bounds():
    with pytest.raises(ValueError):
        text_edge_tokenize("en", (), 3, 2)
