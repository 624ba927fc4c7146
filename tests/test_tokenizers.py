"""Tokenizer determinism + invert-step tests (FIXTURES.md F6 style)."""

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.analysis.tokenizers import (
    delimiter_tokenize,
    get_tokenizer,
    ngram_tokens,
    norm_tokenize,
    pipeline,
    segmentation_tokenize,
    simple_tokenize,
    stopword_filter,
    tokens_to_postings,
)


def test_simple_matches_duckdb_regex_semantics():
    import duckdb

    samples = [
        "Key AGG row--scan  FAST2 value",
        "",
        "   ",
        "a",
        "UPPER lower 123 mix3d",
        "trailing-",
        "-leading",
    ]
    got = simple_tokenize(pd.Series(samples)).tolist()
    con = duckdb.connect()
    for s, g in zip(samples, got):
        (exp,) = con.execute(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'), x -> x <> '')",
            [s],
        ).fetchone()
        assert g == exp, s


def test_simple_deterministic():
    s = pd.Series(["The quick brown FOX", "jumps-over_the lazy dog 42"])
    a = simple_tokenize(s).tolist()
    b = simple_tokenize(s).tolist()
    assert a == b == [
        ["the", "quick", "brown", "fox"],
        ["jumps", "over", "the", "lazy", "dog", "42"],
    ]


def test_segmentation_unicode():
    s = pd.Series(["Héllo Wörld", "ŁÓDŹ okay"])
    out = segmentation_tokenize(s).tolist()
    assert out == [["héllo", "wörld"], ["łódź", "okay"]]


def test_delimiter():
    assert delimiter_tokenize(pd.Series(["a,b,,c"]), ",").tolist() == [["a", "b", "c"]]


def test_ngram():
    out = ngram_tokens(pd.Series(["abcd"]), 2, 3).tolist()
    assert out == [["ab", "bc", "cd", "abc", "bcd"]]
    out2 = ngram_tokens(pd.Series(["a"]), 2, 3, preserve_original=True).tolist()
    assert out2 == [["a"]]


def test_norm_and_stopwords_pipeline():
    tok = pipeline(simple_tokenize, lambda s: stopword_filter(s, {"the", "a"}))
    out = tok(pd.Series(["The quick a fox"])).tolist()
    assert out == [["quick", "fox"]]
    assert norm_tokenize(pd.Series(["ABC"]))[0] == ["abc"]


def test_text_analyzer_locales():
    # 'text' runs the pure-Python en pipeline by default; other locales get
    # the casefold → accent-fold → unicode-segment → stopword pipeline
    # (surface forms, no stem — see tests/test_text_locales.py)
    assert get_tokenizer("text")(pd.Series(["Running dogs"])).tolist() == [["run", "dog"]]
    from iresearch_spark.analysis.tokenizers import text_tokenize

    assert text_tokenize(pd.Series(["Die Hunde"]), locale="de")[0] == ["hunde"]


def test_tokens_to_postings():
    uniq, counts, pos = tokens_to_postings(["b", "a", "b", "c", "a", "b"])
    assert list(uniq) == ["a", "b", "c"]
    np.testing.assert_array_equal(counts, [2, 3, 1])
    # positions 1-based, grouped per term in term order, ascending within term
    np.testing.assert_array_equal(pos, [2, 5, 1, 3, 6, 4])
    uniq0, counts0, pos0 = tokens_to_postings([])
    assert len(uniq0) == 0 and len(counts0) == 0 and len(pos0) == 0


def test_parameterized_analyzer_specs():
    import pandas as pd
    from iresearch_spark.analysis.tokenizers import get_tokenizer, register_analyzer

    s = pd.Series(["a,b,,c", "x,y"])
    assert get_tokenizer("delimiter:,")(s).tolist() == [["a", "b", "c"], ["x", "y"]]
    g = get_tokenizer("ngram:2,3")(pd.Series(["abcd"]))
    assert g.tolist() == [["ab", "bc", "cd", "abc", "bcd"]]
    st = get_tokenizer("simple+stop:the,a")(pd.Series(["The cat a hat"]))
    assert st.tolist() == [["cat", "hat"]]
    register_analyzer("upper", lambda ser: ser.str.upper().str.split())
    assert get_tokenizer("upper")(pd.Series(["ab cd"])).tolist() == [["AB", "CD"]]

    import pytest

    with pytest.raises(KeyError):
        get_tokenizer("nope")


def test_arrow_tokenize_matches_pandas_simple():
    """Arrow fast path must be token-identical to simple_tokenize, including
    unicode edge cases and empty/None docs."""
    import numpy as np
    import pandas as pd
    from iresearch_spark.analysis.tokenizers import arrow_tokenize_encode, simple_tokenize

    # NOTE: chars whose lowercase EXPANDS to multiple codepoints (e.g. 'İ' →
    # 'i' + combining dot in Python, single 'i' in Arrow) are a documented
    # divergence between the two paths; everything else must match exactly.
    texts = [
        "Hello, World! 123",
        "",
        None,
        "  --- ",
        "Straße K café né 0x1F",
        "a" * 5000 + " b0b",
        "tab\tsep\nnewline e2e2e",
    ]
    res = arrow_tokenize_encode(texts, "simple")
    assert res is not None
    codes, uniq, lens = res
    # rebuild per-doc token lists from codes
    got, off = [], 0
    for L in lens:
        got.append([uniq[c] for c in codes[off : off + L]])
        off += int(L)
    want = simple_tokenize(pd.Series(texts)).tolist()
    assert got == want
    assert arrow_tokenize_encode(texts, "segmentation") is None  # no fast path


# --- ngram InputType (ngram_token_stream.hpp:44-69; next_utf8 fixtures) -----


def test_ngram_utf8_codepoint_grams():
    """ngram_token_stream<UTF8> fixtures (ngram_token_stream_test.cpp:
    next_utf8 1-gram / 2-gram over "a¢b£c¤d¥")."""
    import pandas as pd
    from iresearch_spark.analysis.tokenizers import ngram_tokens

    data = pd.Series(["a¢b£c¤d¥"])
    assert ngram_tokens(data, 1, 1).iloc[0] == [
        "a", "¢", "b", "£", "c", "¤", "d", "¥"
    ]
    assert ngram_tokens(data, 2, 2).iloc[0] == [
        "a¢", "¢b", "b£", "£c", "c¤", "¤d",
        "d¥",
    ]


def test_ngram_bytes_mode_splits_multibyte():
    """InputType::Binary (the reference default): grams are BYTE-wise, so a
    2-byte character splits across grams; ASCII inputs match utf8 mode."""
    import pandas as pd
    from iresearch_spark.analysis.tokenizers import get_tokenizer, ngram_tokens

    data = pd.Series(["a¢b"])  # bytes: 61 C2 A2 62
    got = [g.encode("latin-1") for g in
           ngram_tokens(data, 2, 2, input_type="bytes").iloc[0]]
    assert got == [b"a\xc2", b"\xc2\xa2", b"\xa2b"]
    # spec-string plumbing
    tok = get_tokenizer("ngram:1,1,bytes")
    assert [g.encode("latin-1") for g in tok(data).iloc[0]] == [
        b"a", b"\xc2", b"\xa2", b"b"
    ]
    # ASCII: byte grams == codepoint grams
    ascii_data = pd.Series(["quick"])
    assert (
        ngram_tokens(ascii_data, 2, 3, input_type="bytes").iloc[0]
        == ngram_tokens(ascii_data, 2, 3).iloc[0]
    )
