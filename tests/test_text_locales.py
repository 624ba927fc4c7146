"""Multi-locale ``text`` analyzer + CJK-aware unicode segmentation
(text_token_stream.cpp:373-437 locale pipelines;
segmentation_token_stream.cpp UBRK_WORD approximation)."""

import pandas as pd

from iresearch_spark.analysis.tokenizers import (
    get_tokenizer,
    segmentation_tokenize,
    text_tokenize,
)


def test_cjk_han_per_character():
    out = segmentation_tokenize(pd.Series(["大数据 处理 spark"]))[0]
    assert out == ["大", "数", "据", "处", "理", "spark"]


def test_kana_and_hangul_runs_whole():
    out = segmentation_tokenize(pd.Series(["カタカナ ひらがな 한국어 mixed漢字"]))[0]
    assert out == ["カタカナ", "ひらがな", "한국어", "mixed", "漢", "字"]


def test_text_fr_accent_fold_and_stopwords_no_stem():
    out = text_tokenize(pd.Series(["Le café est très bon"]), locale="fr")[0]
    # 'le'/'est' are fr stopwords; accents folded; no stemming (surface forms)
    assert out == ["cafe", "tres", "bon"]


def test_text_de_default_stopwords():
    out = text_tokenize(pd.Series(["Die Katze und der Hund"]), locale="de")[0]
    assert out == ["katze", "hund"]


def test_text_ru_cyrillic():
    out = text_tokenize(pd.Series(["быстрый поиск и индекс"]), locale="ru")[0]
    # the NFD;[:Nonspacing Mark:]Remove;NFC transliterator folds й → и
    # (the breve is a combining mark), exactly like the reference's accent
    # removal (text_token_stream.cpp:1098-1135)
    assert out == ["быстрыи", "поиск", "индекс"]


def test_text_zh_unigrams():
    out = text_tokenize(pd.Series(["倒排索引"]), locale="zh")[0]
    assert out == ["倒", "排", "索", "引"]


def test_thai_lao_khmer_grapheme_clusters():
    # dictionary-less no-space scripts: one token per grapheme cluster
    # (pre-posed vowel + base + dependents; see _UNI_TOKEN_RE divergence notes)
    out = segmentation_tokenize(pd.Series(["สวัสดีครับ ภาษาไทย"]))[0]
    assert out == ["ส", "วั", "ส", "ดี", "ค", "รั", "บ", "ภา", "ษา", "ไท", "ย"]
    lao = segmentation_tokenize(pd.Series(["ພາສາລາວ"]))[0]
    assert lao == ["ພາ", "ສາ", "ລາ", "ວ"]
    km = segmentation_tokenize(pd.Series(["ភាសាខ្មែរ"]))[0]
    assert km == ["ភា", "សា", "ខ្មែ", "រ"]  # coeng stack stays in one cluster
    digits = segmentation_tokenize(pd.Series(["๑๒๓ abc"]))[0]
    assert digits == ["๑๒๓", "abc"]


def test_text_th_index_end_to_end(spark, tmp_path):
    from iresearch_spark import IndexBuilder, IndexReader, Searcher
    from iresearch_spark import filters as flt

    docs = spark.createDataFrame(
        [
            ("d1", "ภาษาไทย สนุก"),
            ("d2", "เรียน ภาษา spark"),
            ("d3", "ไม่มี อะไร"),
        ],
        "doc_key string, text string",
    )
    path = str(tmp_path / "idx_th")
    IndexBuilder(spark, path, analyzer="text:th", num_segments=2).build(
        docs, key_col="doc_key", text_col="text"
    )
    s = Searcher(IndexReader(spark, path))
    # cluster 'ภา' occurs in d1 (ภาษาไทย) and d2 (ภาษา)
    got = s.search(flt.Term("ภา"), k=10).collect()
    assert {r["doc_key"] for r in got} == {"d1", "d2"}
    # phrase of consecutive clusters = the word ภาษา
    ph = s.search(flt.Phrase(("ภา", "ษา")), k=10).collect()
    assert {r["doc_key"] for r in ph} == {"d1", "d2"}


def test_text_en_still_stems():
    out = text_tokenize(pd.Series(["the customers are running"]), locale="en")[0]
    assert out == ["custom", "run"]


def test_spec_parsing_and_custom_stopwords():
    tok = get_tokenizer("text:fr,bon")
    out = tok(pd.Series(["Le café est bon"]))[0]
    assert out == ["le", "cafe", "est"]
    tok2 = get_tokenizer("text:de")
    assert tok2(pd.Series(["und der Hund"]))[0] == ["hund"]


def test_locale_index_end_to_end(spark, tmp_path):
    from iresearch_spark import IndexBuilder, IndexReader, Searcher
    from iresearch_spark import filters as flt

    docs = spark.createDataFrame(
        [
            ("d1", "倒排索引 很快"),
            ("d2", "索引 构建 在 spark"),
            ("d3", "没有 相关 词"),
        ],
        "doc_key string, text string",
    )
    path = str(tmp_path / "idx")
    IndexBuilder(spark, path, analyzer="text:zh", num_segments=2).build(
        docs, key_col="doc_key", text_col="text"
    )
    s = Searcher(IndexReader(spark, path))
    got = s.search(flt.Term("索"), k=10).collect()
    assert {r["doc_key"] for r in got} == {"d1", "d2"}
    # phrase over unigrams = consecutive characters
    ph = s.search(flt.Phrase(("索", "引")), k=10).collect()
    assert {r["doc_key"] for r in ph} == {"d1", "d2"}


def test_collation_primary_strength():
    from iresearch_spark.analysis.tokenizers import collation_tokenize, get_tokenizer
    import pandas as pd

    out = collation_tokenize(pd.Series(["Café", "CAFE", "cafe", "Straße"]))
    assert out[0] == out[1] == out[2] == ["cafe"]
    assert out[3] == ["strasse"]  # NFKD+casefold expands ß
    sec = get_tokenizer("collation:secondary")(pd.Series(["Café", "cafe"]))
    assert sec[0] != sec[1]  # accents survive at secondary strength
    ter = get_tokenizer("collation:tertiary")(pd.Series(["Cafe", "cafe"]))
    assert ter[0] != ter[1]  # case survives at tertiary strength


def test_collation_index_range_order(spark, tmp_path):
    # by_range over collation keys: accented/case variants fold into the
    # same primary key, so a range over plain keys captures them
    from iresearch_spark import IndexBuilder, IndexReader, Searcher
    from iresearch_spark import filters as flt

    docs = spark.createDataFrame(
        [("d1", "Ähnlich"), ("d2", "apfel"), ("d3", "Zebra"), ("d4", "Ödem")],
        "doc_key string, text string",
    )
    path = str(tmp_path / "idx")
    IndexBuilder(spark, path, analyzer="collation:primary", num_segments=2).build(
        docs, key_col="doc_key", text_col="text"
    )
    s = Searcher(IndexReader(spark, path))
    got = s.search(flt.Range(low="a", high="p"), k=10).collect()
    # primary keys: ahnlich, apfel, odem, zebra → range [a, p] matches 3
    assert {r["doc_key"] for r in got} == {"d1", "d2", "d4"}


def test_minhash_analyzer_plane(spark, tmp_path):
    # minhash ANALYZER (minhash_token_stream.hpp): signature values become
    # index terms; near-dup retrieval = Terms/min_match over one doc's tokens
    import pandas as pd
    from iresearch_spark.analysis.tokenizers import get_tokenizer, minhash_tokenize
    from iresearch_spark import IndexBuilder, IndexReader, Searcher
    from iresearch_spark import filters as flt
    from iresearch_spark import textops

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tail"          # high shingle overlap
    far = "completely different words in this other document entirely here"
    toks = minhash_tokenize(pd.Series([base, near, far]), num_hashes=8)
    assert len(toks[0]) == 8 and all("_" in t for t in toks[0])
    shared_near = len(set(toks[0]) & set(toks[1]))
    shared_far = len(set(toks[0]) & set(toks[2]))
    assert shared_near > shared_far and shared_far == 0

    # analyzer-plane signatures agree with the textops operator plane
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    sig = textops.minhash_signatures(docs, num_hashes=8).collect()
    by_id = {int(r["doc_id"]): [f"{i}_{r[f'mh{i}']}" for i in range(8)] for r in sig}
    assert by_id[0] == toks[0]

    # end-to-end: index with the analyzer, near-dup query via min_match
    path = str(tmp_path / "idx")
    IndexBuilder(spark, path, analyzer="minhash:8", num_segments=2).build(
        docs.selectExpr("cast(doc_id as string) doc_key", "text"),
        key_col="doc_key", text_col="text",
    )
    s = Searcher(IndexReader(spark, path))
    got = s.search(flt.Terms(tuple(toks[0]), min_match=4), k=10).collect()
    assert {r["doc_key"] for r in got} == {"0", "1"}
