"""ICU-divergence contract (r4 verdict item 5): the segmentation
approximation's behavior on every documented divergence class is PINNED by
tests/fixtures/icu_divergence.json — the fixture records both the engine's
tokens (asserted here; a `_UNI_TOKEN_RE` regression fails these tests) and
the hand-derived ICU UBRK_WORD tokens (documentation of the gap).

Reference: segmentation_token_stream.cpp:1-395 (ICU BreakIterator word
instance); text_token_stream.cpp:373-437 (the text pipeline that consumes
it). SURVEY.md §2.1 links this contract.
"""

import json
import os

import pandas as pd
import pytest

from iresearch_spark.analysis.tokenizers import segmentation_tokenize, text_tokenize

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "icu_divergence.json")
with open(FIXTURE, encoding="utf-8") as f:
    CASES = json.load(f)["cases"]


@pytest.mark.parametrize("case", CASES, ids=[c["class"] for c in CASES])
def test_engine_segmentation_pinned(case):
    got = segmentation_tokenize(pd.Series([case["input"]])).iloc[0]
    assert got == case["engine"], (
        f"{case['class']}: segmentation drifted from the pinned contract; "
        f"got {got!r}, fixture {case['engine']!r} (ICU would emit {case['icu']!r})"
    )


@pytest.mark.parametrize("case", CASES, ids=[c["class"] for c in CASES])
def test_text_pipeline_consistent_with_contract(case):
    # the full `text` analyzer (no stopwords for these locales) must segment
    # at the SAME boundaries — index-side and query-side tokens agree, which
    # is the recall-preservation argument the divergence classes rest on —
    # and then accent-fold each token (reference process_term order:
    # segmentation decides mark-dependent boundaries BEFORE marks strip)
    from iresearch_spark.analysis.tokenizers import _fold_one

    got = text_tokenize(pd.Series([case["input"]]), locale="zz", stopwords=()).iloc[0]
    assert got == [_fold_one(t.casefold()) for t in case["engine"]]


def test_fixture_covers_every_documented_class():
    # the doc comment at _UNI_TOKEN_RE names these divergence classes; keep
    # the fixture exhaustive when a new class is added
    classes = {c["class"] for c in CASES}
    assert {
        "zh_han_unigram", "ja_mixed_script", "th_grapheme_cluster",
        "lo_grapheme_cluster", "km_coeng_cluster", "locale_word_rules",
    } <= classes
