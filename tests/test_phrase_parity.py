"""Reference-parity phrase scoring (`phrase_scoring="sum_of_terms"`).

Reference semantics: by_phrase prepare collects per-term stats and each
member term ACCUMULATES into one aggregated stats blob — the BM25/TFIDF
collectors do ``idf += ...`` per term (phrase_filter.cpp:231-318
``term_stats.finish``; bm25.cpp:495-497; tfidf.cpp:380-382) — then the phrase
frequency plugs into the scorer as tf. Variadic slots sum ALL expanded
terms' idfs (phrase_filter.cpp:418-427 per-slot collectors).

Oracle: brute force in Python over a tiny corpus.
"""

import math

import pytest

from iresearch_spark import IndexBuilder, IndexReader, Searcher
from iresearch_spark import filters as flt

K1, B = 1.2, 0.75

DOCS = [
    ("d01", "fast scan runs fast scan again and again"),
    ("d02", "fast scan"),
    ("d03", "slow scan then fast merge"),
    ("d04", "fast sort fast scan fast star"),
    ("d05", "the quick fox"),
    ("d06", "fast scan fast scan fast scan"),
]


def _phrase_tf(toks, phrase):
    n = 0
    for i in range(len(toks) - len(phrase) + 1):
        if toks[i : i + len(phrase)] == list(phrase):
            n += 1
    return n


def _brute(phrase_slots, scorer="bm25"):
    """Brute-force sum-of-terms phrase scoring; slots = list of term lists."""
    toks = {k: t.split() for k, t in DOCS}
    dls = {k: len(t) for k, t in toks.items()}
    n = sum(1 for d in dls.values() if d > 0)
    avgdl = sum(dls.values()) / n
    df = {}
    for terms in toks.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    idf_sum = 0.0
    for slot in phrase_slots:
        for t in slot:
            if t not in df:
                continue
            if scorer == "bm25":
                idf_sum += math.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
            else:
                idf_sum += math.log((n + 1.0) / (df[t] + 1.0)) + 1.0
    out = []
    for k, t in toks.items():
        # variadic tf: count windows where every slot matches one of its terms
        tf = 0
        width = len(phrase_slots)
        for i in range(len(t) - width + 1):
            if all(t[i + j] in phrase_slots[j] for j in range(width)):
                tf += 1
        if tf == 0:
            continue
        if scorer == "bm25":
            s = (K1 + 1.0) * idf_sum * tf / (
                K1 * (1 - B) + K1 * B * dls[k] / avgdl + tf
            )
        else:
            s = idf_sum * math.sqrt(tf)
        out.append((k, s))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "idx")
    df = spark.createDataFrame(DOCS, "doc_key string, text string")
    IndexBuilder(spark, path, analyzer="simple", num_segments=2).build(
        df, key_col="doc_key", text_col="text"
    )
    return IndexReader(spark, path)


def test_fixed_phrase_sum_of_terms_bm25(idx):
    got = Searcher(idx, phrase_scoring="sum_of_terms").search(
        flt.Phrase(("fast", "scan")), k=10
    ).collect()
    want = _brute([["fast"], ["scan"]])
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_fixed_phrase_sum_of_terms_tfidf(idx):
    got = Searcher(idx, scorer="tfidf", phrase_scoring="sum_of_terms").search(
        flt.Phrase(("fast", "scan")), k=10
    ).collect()
    want = _brute([["fast"], ["scan"]], scorer="tfidf")
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_variadic_phrase_sums_all_expanded_terms(idx):
    # Prefix("s") expands to every s-term in the index; ALL their idfs sum
    # into the stats blob whether or not a given doc matched that variant
    got = Searcher(idx, phrase_scoring="sum_of_terms").search(
        flt.Phrase(("fast", flt.Prefix("s"))), k=10
    ).collect()
    vocab = sorted({t for _, txt in DOCS for t in txt.split() if t.startswith("s")})
    want = _brute([["fast"], vocab])
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_exact_df_mode_unchanged(idx):
    # default mode still scores by exact phrase document frequency
    got = Searcher(idx).search(flt.Phrase(("fast", "scan")), k=10).collect()
    toks = {k: t.split() for k, t in DOCS}
    dls = {k: len(t) for k, t in toks.items()}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    tfs = {k: _phrase_tf(t, ("fast", "scan")) for k, t in toks.items()}
    dfp = sum(1 for v in tfs.values() if v)
    idf = math.log1p((n - dfp + 0.5) / (dfp + 0.5))
    want = sorted(
        (
            (k, (K1 + 1) * idf * tf / (K1 * (1 - B) + K1 * B * dls[k] / avgdl + tf))
            for k, tf in tfs.items()
            if tf
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]


def test_same_position_sum_of_terms(spark, tmp_path):
    # synonym analyzer emits 'seek0' at the same position as every 'scan';
    # SamePosition under sum_of_terms sums both terms' idfs
    path = str(tmp_path / "idx")
    df = spark.createDataFrame(DOCS, "doc_key string, text string")
    IndexBuilder(
        spark, path, analyzer="simple+syn:scan=seek0", num_segments=2
    ).build(df, key_col="doc_key", text_col="text")
    reader = IndexReader(spark, path)
    got = Searcher(reader, phrase_scoring="sum_of_terms").search(
        flt.SamePosition(("scan", "seek0")), k=10
    ).collect()
    assert got  # non-empty: every scan position carries the synonym
    toks = {k: t.split() for k, t in DOCS}
    # doc_len counts position slots (synonyms are increment-0)
    dls = {k: len(t) for k, t in toks.items()}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    df_scan = sum(1 for t in toks.values() if "scan" in t)
    idf_sum = 2 * math.log1p((n - df_scan + 0.5) / (df_scan + 0.5))
    want = sorted(
        (
            (k, (K1 + 1) * idf_sum * tf / (K1 * (1 - B) + K1 * B * dls[k] / avgdl + tf))
            for k, tf in ((k, t.count("scan")) for k, t in toks.items())
            if tf
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [(r["doc_key"], round(r["score"], 9)) for r in got] == [
        (k, round(s, 9)) for k, s in want
    ]
