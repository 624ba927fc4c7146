"""Pure-Python Porter2 (Snowball "english") stemmer.

Re-implemented from the published algorithm description
(snowballstem.org/algorithms/english/stemmer.html) — the same algorithm the
reference's ``text`` analyzer runs via libstemmer
(core/analysis/text_token_stream.cpp:483-531 sb_stemmer usage). No external
stemmer package is available in this environment, so the algorithm is coded
here directly and verified against hand-traced fixture pairs in
tests/test_text_analyzer.py.

Only the "english" (Porter2) variant is provided; it covers the reference's
default locale pipeline for our corpus.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")  # Y (consonant-marked) is NOT a vowel
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    {"inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"}
)

_STEP2 = (  # longest-match-first; (suffix, replacement, extra-condition key)
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", "l"),  # only when preceded by l
    ("li", "", "li"),  # only when preceded by a valid li-ending
)

_STEP3 = (
    ("ational", "ate", False),
    ("tional", "tion", False),
    ("alize", "al", False),
    ("icate", "ic", False),
    ("iciti", "ic", False),
    ("ical", "ic", False),
    ("ful", "", False),
    ("ness", "", False),
    ("ative", "", True),  # delete only when in R2
)

_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",
    "al",
    "er",
    "ic",
)


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the spec, incl. gener/commun/arsen R1s."""
    r1 = len(word)
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, len(word)):
            if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """(a) non-vowel, vowel, non-vowel(≠wxY) at the end, or (b) word is
    vowel + non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (not _is_vowel(a)) and _is_vowel(b) and (not _is_vowel(c)) and c not in "wxY"
    return False


def _has_vowel(s: str) -> bool:
    return any(_is_vowel(c) for c in s)


@lru_cache(maxsize=65536)
def stem_english(token: str) -> str:
    """Porter2 stem of a lowercase token."""
    word = token
    if word.startswith("'"):
        word = word[1:]
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    # mark consonant-y as Y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _regions(word)

    # step 0: 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and _has_vowel(word[:-2]):
        word = word[:-1]
    if word in _EXCEPTIONS2:
        return word

    # step 1b
    step1b_done = False
    for suf, rep in (("eedly", "ee"), ("eed", "ee")):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _has_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # step 1c: y/Y -> i when preceded by a non-vowel that is not word start
    if len(word) > 2 and word[-1] in "yY" and not _is_vowel(word[-2]):
        word = word[:-1] + "i"

    # step 2 (R1)
    for suf, rep, cond in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "l" and not (len(word) > len(suf) and word[-len(suf) - 1] == "l"):
                    pass
                elif cond == "li" and not (
                    len(word) > len(suf) and word[-len(suf) - 1] in _LI_VALID
                ):
                    pass
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3 (R1; 'ative' needs R2)
    for suf, rep, needs_r2 in _STEP3:
        if word.endswith(suf):
            region = r2 if needs_r2 else r1
            if len(word) - len(suf) >= region:
                word = word[: -len(suf)] + rep
            break

    # step 4 (R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        base = word[:-1]
        if len(word) - 1 >= r2 or (len(word) - 1 >= r1 and not _ends_short_syllable(base)):
            word = base
    elif word.endswith("l") and len(word) - 1 >= r2 and word.endswith("ll"):
        word = word[:-1]

    return word.replace("Y", "y")
