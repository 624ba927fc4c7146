"""Porter2 stemmer + text_en analyzer fixtures.

The stemmer is re-implemented from the published Snowball english algorithm;
these pairs are hand-traced against the spec (steps annotated) plus the
spec's own exception lists.
"""

import pandas as pd
import pytest

from iresearch_spark.analysis.stemmer import stem_english
from iresearch_spark.analysis.tokenizers import (
    DEFAULT_STOPWORDS,
    accent_fold,
    get_tokenizer,
    text_en_tokenize,
)

# (word, stem) — traced through the algorithm by hand
FIXTURES = [
    # exceptions list 1
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("news", "news"),
    ("sky", "sky"),
    ("early", "earli"),
    ("only", "onli"),
    # exceptions list 2 (stop after 1a)
    ("inning", "inning"),
    ("proceed", "proceed"),
    ("exceed", "exceed"),
    # <= 2 letters unchanged
    ("by", "by"),
    ("is", "is"),
    # step 0 / 1a
    ("boy's", "boy"),
    ("caresses", "caress"),
    ("flies", "fli"),
    ("dies", "die"),
    ("ties", "tie"),
    ("cats", "cat"),
    ("gas", "gas"),  # 's' preceded immediately by vowel only -> kept
    ("this", "this"),  # no vowel before penultimate char
    ("kiwis", "kiwi"),
    # step 1b
    ("agreed", "agre"),  # eed in R1 -> ee; step 5 drops one e
    ("feed", "feed"),  # eed NOT in R1
    ("plastered", "plaster"),
    ("bled", "bled"),  # no vowel in stem "bl"
    ("motoring", "motor"),
    ("sing", "sing"),  # no vowel in "s"
    ("conflated", "conflat"),  # ed -> at -> ate; step 5 drops e (R1, no short syll)
    ("troubled", "troubl"),
    ("sized", "size"),  # iz -> ize; e kept (R2 null, base ends short syllable)
    ("hopping", "hop"),  # double pp undoubled
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),  # short word after -ing -> +e
    ("running", "run"),
    # step 1c
    ("cry", "cri"),
    ("say", "say"),  # y after vowel
    ("happy", "happi"),
    # step 2
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("formative", "format"),  # ative fails R2; step 4 ive (R2) fires
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "communism"),  # commun R1 exception keeps ism out of R2
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # general
    ("generate", "generat"),
    ("generation", "generat"),
    ("agreement", "agreement"),
    ("customer", "custom"),
    ("merge", "merg"),
    ("query", "queri"),
    ("consign", "consign"),
    ("consigned", "consign"),
    ("consigning", "consign"),
    ("knack", "knack"),
]


@pytest.mark.parametrize("word,expect", FIXTURES)
def test_stem_fixture(word, expect):
    assert stem_english(word) == expect, f"{word} -> {stem_english(word)} != {expect}"


def test_stem_idempotent_on_common_words():
    for w, _ in FIXTURES:
        s = stem_english(w)
        # stems are not guaranteed idempotent in general, but must be stable
        # strings of lowercase letters
        assert s == s.lower() and "'" not in s


def test_accent_fold():
    s = accent_fold(pd.Series(["café", "naïve", "École", "plain"]))
    assert list(s) == ["cafe", "naive", "Ecole", "plain"]


def test_text_en_pipeline():
    out = text_en_tokenize(pd.Series(["The Customers' Queries are RUNNING fast!"]))
    # "the"/"are" stopped; customers' -> customers -> customer -> custom;
    # queries -> queri (1a ies->i after >1 letter... 'quer'+'i'); running -> run
    assert list(out)[0] == ["custom", "queri", "run", "fast"]


def test_text_en_stopword_spec():
    tok = get_tokenizer("text_en:")  # empty stopword list
    out = tok(pd.Series(["the cat"]))
    assert list(out)[0] == ["the", "cat"]
    tok2 = get_tokenizer("text_en:cat")
    assert list(tok2(pd.Series(["the cat"])))[0] == ["the"]


def test_registry_text_alias():
    tok = get_tokenizer("text")
    assert list(tok(pd.Series(["Fishing boats"])))[0] == ["fish", "boat"]
