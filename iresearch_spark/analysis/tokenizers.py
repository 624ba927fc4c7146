"""Vectorized analyzers — the scan-side token streams of the engine.

Reference analyzers live in ``core/analysis/`` (SURVEY.md §2.1). Each one here
operates on a ``pandas.Series`` of strings and returns per-doc token lists —
suitable for use inside ``mapInArrow`` / pandas UDFs (no per-row Python in the
Spark plan; the per-row work happens batched in C-backed pandas/regex).

Registered analyzers (name → factory), mirroring REGISTER_ANALYZER_*:

* ``simple``        — lower + split on ``[^a-z0-9]+`` (our deterministic default;
                      oracle-reproducible in DuckDB with
                      ``regexp_split_to_array(lower(text),'[^a-z0-9]+')``).
* ``segmentation``  — unicode word segmentation approximation (\\w+ on casefolded
                      text); reference: segmentation_token_stream.cpp.
* ``delimiter``     — split on a single delimiter (delimited_token_stream.cpp).
* ``ngram``         — char n-grams [min,max] (ngram_token_stream.cpp).
* ``norm``          — lower/upper + NFC normalize, single token
                      (text_token_normalizing_stream.cpp).
* ``stopwords``     — drop masked tokens (token_stopwords_stream.cpp).
* ``pipeline``      — compose analyzers (pipeline_token_stream.cpp).
* ``text``          — reference ICU+Snowball pipeline (text_token_stream.cpp)
                      for any locale: casefold → accent fold → unicode/CJK
                      segmentation → locale stopwords → stem (Porter2 for en;
                      other locales index surface forms — documented).
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Callable, Iterable

import numpy as np
import pandas as pd

Tokenizer = Callable[[pd.Series], pd.Series]  # Series[str] -> Series[list[str]]

_SIMPLE_RE = re.compile(r"[a-z0-9]+")
_WORD_RE = re.compile(r"\w+", re.UNICODE)

# UAX#29-flavoured segmentation with CJK + SE-Asian handling (approximation
# of ICU UBRK_WORD, segmentation_token_stream.cpp): Han ideographs emit ONE
# TOKEN PER CHARACTER (the unigram approximation of ICU's dictionary-based
# zh/ja segmentation — the standard fallback when no dictionary is present),
# kana and hangul runs stay whole, and the dictionary-less scripts with no
# word spaces (Thai / Lao / Khmer) emit ONE TOKEN PER GRAPHEME CLUSTER
# (optional pre-posed vowel + base consonant + dependent vowels / tone marks;
# Khmer includes coeng-stacked subscripts). Every other \w run is a word; the
# general word class excludes all special ranges so they aren't swallowed.
#
# Documented divergence classes vs ICU (segmentation_token_stream.cpp):
#  * zh/ja Han: unigrams, not dictionary words — consistent between index and
#    query, so recall is unchanged and phrases model adjacency at char grain;
#  * th/lo/km: grapheme clusters, not dictionary words — same consistency
#    argument; a multi-syllable word becomes a phrase of its clusters;
#  * locale-tailored suppressions/abbreviation rules (en_US_POSIX etc.) are
#    not modeled; \w follows Python's Unicode word classes, not ICU's.
_CJK_HAN = "\u4e00-\u9fff\u3400-\u4dbf\uf900-\ufaff"
_KANA = "\u3040-\u309f\u30a0-\u30ff\u31f0-\u31ff"
_HANGUL = "\uac00-\ud7af\u1100-\u11ff"
_THAI = "\u0e00-\u0e7f"
_LAO = "\u0e80-\u0eff"
_KHMER = "\u1780-\u17ff"
_SEA = _THAI + _LAO + _KHMER
_UNI_TOKEN_RE = re.compile(
    f"[{_CJK_HAN}]"           # one Han ideograph per token
    f"|[{_KANA}]+"            # kana run
    f"|[{_HANGUL}]+"          # hangul run
    "|[\u0e50-\u0e59]+|[\u0ed0-\u0ed9]+|[\u17e0-\u17e9]+"  # th/lo/km digit runs
    # Thai cluster: pre-posed vowel? + consonant + dependent vowels/tones
    "|[\u0e40-\u0e44]?[\u0e01-\u0e2e](?:[\u0e30-\u0e3a\u0e45-\u0e4e])*"
    # Lao cluster
    "|[\u0ec0-\u0ec4]?[\u0e81-\u0eaf](?:[\u0eb0-\u0ebf\u0ec6-\u0ecd])*"
    # Khmer cluster: base (+ coeng-stacked subscripts) + dependents
    "|[\u1780-\u17b3](?:\u17d2[\u1780-\u17a2]|[\u17b4-\u17d1\u17d3\u17dd])*"
    f"|(?:(?![{_CJK_HAN}{_KANA}{_HANGUL}{_SEA}])\\w)+",  # any other word run
    re.UNICODE,
)


def simple_tokenize(texts: pd.Series) -> pd.Series:
    """lower() then extract ``[a-z0-9]+`` runs. Matches the DuckDB oracle
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` with empties dropped."""
    return texts.fillna("").str.lower().str.findall(_SIMPLE_RE)


# full segmentation incl. non-word segments, for word_break all/graphic:
# the word classes of _UNI_TOKEN_RE, plus ONE SEGMENT PER punctuation/
# symbol/whitespace character — UAX29's "otherwise break everywhere"
# (WB999) makes every Other-class char its own segment, confirmed by the
# reference fixtures (")" and "-" separate,
# segmentation_stream_tests.cpp:141-205); every char lands in exactly one
# segment
_UNI_SEG_ALL_RE = re.compile(
    _UNI_TOKEN_RE.pattern + r"|[^\w\s]|\s", re.UNICODE
)
_HAS_SPACE_ONLY_RE = re.compile(r"^\s+$")


def segmentation_tokenize(
    texts: pd.Series, case: str = "lower", word_break: str = "alpha"
) -> pd.Series:
    """Unicode word segmentation (approximation of ICU UBRK_WORD;
    segmentation_token_stream.cpp): \\w runs per word, Han ideographs one
    token per character, kana/hangul runs whole — see ``_UNI_TOKEN_RE``.

    ``word_break`` mirrors options_t::word_break_t
    (segmentation_token_stream.cpp:280-293 accept_token): ``alpha``
    (default) keeps segments containing an alphanumeric — the word runs;
    ``graphic`` also keeps punctuation/symbol runs (segments with any
    non-whitespace char); ``all`` keeps every segment including whitespace
    runs."""
    s = texts.fillna("")
    if case == "lower":
        s = s.str.casefold()
    elif case == "upper":
        s = s.str.upper()
    if word_break == "alpha":
        return s.str.findall(_UNI_TOKEN_RE)
    if word_break not in ("all", "graphic"):
        raise ValueError(f"unknown word_break {word_break!r}")
    segs = s.str.findall(_UNI_SEG_ALL_RE)
    if word_break == "all":
        return segs
    return segs.map(lambda toks: [t for t in toks if not _HAS_SPACE_ONLY_RE.match(t)])


def delimiter_tokenize(texts: pd.Series, delimiter: str = ",") -> pd.Series:
    """delimited_token_stream.cpp: split on a single delimiter, keep empties
    dropped (reference keeps payload semantics we don't need)."""
    return texts.fillna("").str.split(re.escape(delimiter)).map(
        lambda toks: [t for t in toks if t]
    )


def ngram_tokens(
    texts: pd.Series,
    min_gram: int = 2,
    max_gram: int = 3,
    preserve_original: bool = False,
    start_marker: str = "",
    end_marker: str = "",
    input_type: str = "utf8",
) -> pd.Series:
    """ngram_token_stream.cpp: char n-grams of each input string.

    ``input_type`` mirrors the reference's ``InputType``
    (ngram_token_stream.hpp:44-69): ``"utf8"`` grams are codepoint-wise
    (ngram_token_stream<UTF8>, pinned against the next_utf8 fixtures);
    ``"bytes"`` grams are BYTE-wise over the UTF-8 encoding
    (InputType::Binary, the reference DEFAULT) — multi-byte characters
    split across grams. Byte grams are carried as latin-1-decoded strings
    (a lossless byte<->str mapping) since this engine's term dictionary
    stores strings; ASCII inputs are identical in both modes.

    ``start_marker``/``end_marker`` (Options.start_marker/end_marker,
    ngram_token_stream.hpp:56-70): every gram anchored at the stream start
    is emitted as ``start_marker + gram``, every gram touching the stream
    end as ``gram + end_marker`` (start wins when a gram is both, and a
    whole-cover gram is additionally re-emitted end-marked). The original
    (``preserve_original``) follows the same chain: start-marked first,
    then end-marked. The marked path replicates the reference's emission
    ORDER exactly (position-outer, ascending length, original flushed
    before leaving position 0 — next():494-567; sequences pinned against
    tests/analysis/ngram_token_stream_test.cpp:1030-1163 fixtures). The
    legacy no-marker path keeps this module's historical length-outer
    order (same multiset; only position attributes would differ, which
    this analyzer plane does not index)."""

    as_bytes = input_type == "bytes"
    if as_bytes:
        # markers are byte strings in the reference; same lossless mapping
        start_marker = start_marker.encode("utf-8").decode("latin-1")
        end_marker = end_marker.encode("utf-8").decode("latin-1")

    def _one(s: str) -> list[str]:
        if as_bytes:
            s = s.encode("utf-8", "surrogatepass").decode("latin-1")
        out = []
        n = len(s)
        if not start_marker and not end_marker:
            for g in range(min_gram, max_gram + 1):
                out.extend(s[i : i + g] for i in range(0, n - g + 1))
            if preserve_original and (n < min_gram or n > max_gram):
                out.append(s)
            return out
        # marked path — reference-exact order
        emit = None  # pending original: "start" | "end" | "plain" | None
        if preserve_original:
            emit = "start" if start_marker else ("end" if end_marker else "plain")

        def flush(state):
            while state is not None:
                if state == "start":
                    out.append(start_marker + s)
                    state = "end" if end_marker else None
                elif state == "end":
                    out.append(s + end_marker)
                    state = None
                else:  # plain
                    out.append(s)
                    state = None

        pos = 0
        while pos < n:
            for length in range(min_gram, min(max_gram, n - pos) + 1):
                gram = s[pos : pos + length]
                covers = pos == 0 and length == n
                if emit is not None and covers:
                    # the gram IS the original: route through the chain
                    flush(emit)
                    emit = None
                    continue
                at_start = pos == 0 and bool(start_marker)
                at_end = pos + length == n and bool(end_marker)
                if at_start:  # start wins (next():505-523)
                    out.append(start_marker + gram)
                    if covers and end_marker:
                        out.append(gram + end_marker)
                elif at_end:
                    out.append(gram + end_marker)
                else:
                    out.append(gram)
            if emit is not None:  # cannot leave pos 0 with the original pending
                flush(emit)
                emit = None
            pos += 1
        return out

    return texts.fillna("").map(_one)


def norm_tokenize(
    texts: pd.Series, case: str = "lower", form: str = "NFC", accent: bool = True
) -> pd.Series:
    """text_token_normalizing_stream.cpp: normalize + case (+ optional
    accent removal), single token out. ``accent=False`` mirrors the
    reference's ``"accent": false`` option (options_t.accent; the ICU
    transliterator rule NFD → remove nonspacing marks → NFC applied after
    case conversion, text_token_normalizing_stream.cpp:367-414)."""
    s = texts.fillna("").map(lambda t: unicodedata.normalize(form, t))
    if case == "lower":
        s = s.str.lower()
    elif case == "upper":
        s = s.str.upper()
    if not accent:
        s = s.map(
            lambda t: unicodedata.normalize(
                "NFC",
                "".join(
                    c
                    for c in unicodedata.normalize("NFD", t)
                    if unicodedata.category(c) != "Mn"
                ),
            )
        )
    return s.map(lambda t: [t])


def stopword_filter(token_lists: pd.Series, stopwords: Iterable[str]) -> pd.Series:
    """token_stopwords_stream.cpp: drop masked tokens."""
    sw = frozenset(stopwords)
    return token_lists.map(lambda toks: [t for t in toks if t not in sw])


def synonym_tokenizer(
    synonyms: dict[str, str], base: Tokenizer | None = None
) -> Tokenizer:
    """Positional analyzer injecting synonyms at increment 0 — the
    ``token_stream`` 0-increment semantics (token_attributes.hpp ``increment``;
    nearest_neighbors_stream.cpp emits synonyms this way). Each base token at
    position p whose term has a synonym also emits the synonym AT p, so
    ``by_same_position`` finds (term, synonym) sharing a slot. Returns
    ``(tokens, positions)`` pairs; ``emits_positions`` marks the contract for
    the invert kernel."""
    base = base or simple_tokenize

    def _run(texts: pd.Series) -> pd.Series:
        tok_lists = base(texts)

        def _one(toks: list[str]):
            ts: list[str] = []
            ps: list[int] = []
            for i, t in enumerate(toks, 1):
                ts.append(t)
                ps.append(i)
                s = synonyms.get(t)
                if s is not None:
                    ts.append(s)
                    ps.append(i)
            return (ts, ps)

        return tok_lists.map(_one)

    _run.emits_positions = True
    return _run


def payload_tokenizer(sep: str = "|") -> Tokenizer:
    """Delimited-payload analyzer — the PAY stream producer
    (token_attributes.hpp ``payload`` attribute; the reference persists
    per-position payload bytes in the ``.pay`` stream,
    formats_10.cpp:345-353; the delimited convention is the standard way
    token streams attach payloads, cf. Lucene's DelimitedPayloadTokenFilter).

    Input text is whitespace-split into ``token<sep>payload`` pieces: the
    token part is lowercased, the payload part parsed as a non-negative
    integer (0 when absent/invalid). Emits ``(tokens, payloads)`` pairs;
    ``emits_payloads`` marks the contract for the invert kernel, which
    persists one payload per occurrence in the ``payloads`` sidecar."""

    def _run(texts: pd.Series) -> pd.Series:
        def _one(s: str):
            ts: list[str] = []
            ps: list[int] = []
            for piece in (s or "").split():
                tok, _, pay = piece.rpartition(sep)
                if not tok:  # no separator: bare token, payload 0
                    tok, pay = piece, ""
                ts.append(tok.lower())
                ps.append(int(pay) if pay.isdigit() else 0)
            return (ts, ps)

        return texts.fillna("").map(_one)

    _run.emits_payloads = True
    return _run


def pipeline(*stages: Callable[[pd.Series], pd.Series]) -> Tokenizer:
    """pipeline_token_stream.cpp: compose — first stage takes text, later
    stages take token lists (applied token-wise via re-tokenize of joins is NOT
    done; stages past the first must be list->list like ``stopword_filter``)."""

    def _run(texts: pd.Series) -> pd.Series:
        out = texts
        for st in stages:
            out = st(out)
        return out

    return _run


DEFAULT_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "as", "with", "be", "by", "at", "this", "are", "or", "was",
)


def accent_fold(texts: pd.Series) -> pd.Series:
    """NFD → drop combining marks → NFC (the reference's
    ``"NFD; [:Nonspacing Mark:] Remove; NFC"`` transliterator,
    text_token_stream.cpp:1098-1135)."""

    def _fold(s: str) -> str:
        d = unicodedata.normalize("NFD", s)
        return unicodedata.normalize(
            "NFC", "".join(c for c in d if not unicodedata.combining(c))
        )

    return texts.map(_fold)


def _fold_one(t: str) -> str:
    """Per-token accent fold (NFD → drop combining marks → NFC)."""
    d = unicodedata.normalize("NFD", t)
    return unicodedata.normalize(
        "NFC", "".join(c for c in d if not unicodedata.combining(c))
    )


def text_en_tokenize(
    texts: pd.Series, stopwords: Iterable[str] = DEFAULT_STOPWORDS
) -> pd.Series:
    """Reference ``text`` analyzer pipeline, pure Python — the reference's
    PER-TOKEN order (text_token_stream.cpp next_word + process_term:
    segment on the raw text → normalize/case → accent removal → stopword
    check on the folded form → Snowball stem). Accent folding runs AFTER
    segmentation (per token) so mark-dependent token boundaries — the
    th/lo/km grapheme clusters — are decided before the marks are stripped,
    exactly as ICU's transliterator sees one break-iterator word at a time.

    Differences vs the reference, documented: segmentation is the
    ``_UNI_TOKEN_RE`` approximation of ICU UBRK_WORD over casefolded text
    (identical on alphanumeric ASCII corpora; divergence classes pinned in
    tests/fixtures/icu_divergence.json), and the stemmer is the published
    Porter2 algorithm re-implemented in :mod:`.stemmer` (the reference links
    libstemmer's generated code for the same algorithm)."""
    from .stemmer import stem_english

    sw = frozenset(stopwords)
    tok_lists = texts.fillna("").str.casefold().str.findall(_UNI_TOKEN_RE)
    # fold+stem via a per-batch vocab cache: once per unique token, not per
    # occurrence (vocab << corpus)
    cache: dict[str, str | None] = {}

    def _one(toks: list[str]) -> list[str]:
        out = []
        for t in toks:
            s = cache.get(t, "")
            if s == "":
                f = _fold_one(t) if not t.isascii() else t
                cache[t] = s = None if f in sw else stem_english(f)
            if s is not None:
                out.append(s)
        return out

    return tok_lists.map(_one)


# abridged per-locale stopword lists (the reference ships the full snowball
# lists per locale; these carry the most frequent function words — users pass
# their own list for exactness)
LOCALE_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": DEFAULT_STOPWORDS,
    "de": ("der", "die", "das", "und", "in", "zu", "den", "ist", "von", "mit",
           "auf", "für", "ein", "eine", "nicht"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "du", "en",
           "est", "que", "pour", "dans", "pas"),
    "es": ("el", "la", "los", "las", "de", "y", "en", "un", "una", "que",
           "es", "por", "con", "para", "no"),
    "ru": ("и", "в", "не", "на", "что", "с", "по", "это", "как", "из",
           "но", "для", "он", "она", "то"),
}


def text_tokenize(
    texts: pd.Series,
    locale: str = "en",
    stopwords: Iterable[str] | None = None,
) -> pd.Series:
    """Reference ``text`` analyzer pipeline for ANY locale
    (text_token_stream.cpp:373-437): casefold → accent fold (the
    ``NFD; [:Nonspacing Mark:] Remove; NFC`` transliterator) → unicode word
    segmentation (Han per-character, kana/hangul runs — the no-dictionary
    ICU approximation) → locale stopword filter → stem.

    Documented divergences: segmentation approximates UBRK_WORD (identical
    on alphanumeric text; CJK uses the unigram fallback instead of ICU's
    dictionaries), and stemming runs ONLY for ``en`` (hand-built Porter2) —
    other locales index surface forms (the reference links per-locale
    snowball stemmers). ``stopwords=None`` picks the abridged built-in list
    for the locale's language (empty when unknown)."""
    lang = locale.split("_")[0].split("-")[0].lower()
    if lang == "en" and stopwords is None:
        return text_en_tokenize(texts)
    if lang == "en":
        return text_en_tokenize(texts, stopwords)
    sw = frozenset(
        stopwords if stopwords is not None else LOCALE_STOPWORDS.get(lang, ())
    )
    # reference per-token order (process_term): segment FIRST, then fold each
    # token, then the stopword check on the folded form — mark-dependent
    # boundaries (th/lo/km clusters) are decided before marks are stripped
    tok_lists = texts.fillna("").str.casefold().str.findall(_UNI_TOKEN_RE)
    cache: dict[str, str | None] = {}

    def _one(toks: list[str]) -> list[str]:
        out = []
        for t in toks:
            s = cache.get(t, "")
            if s == "":
                f = _fold_one(t) if not t.isascii() else t
                cache[t] = s = None if f in sw else f
            if s is not None:
                out.append(s)
        return out

    return tok_lists.map(_one)


def text_edge_tokenize(
    locale: str = "en",
    stopwords: Iterable[str] | None = None,
    min_gram: int = 2,
    max_gram: int = 3,
    preserve_original: bool = False,
) -> Tokenizer:
    """``text`` analyzer with the optional EDGE-NGRAM stage over the stemmed
    output (text_token_stream.cpp:483-531 options parsing; next_ngram()
    emission at text_token_stream.cpp:1137-1204) — the search-as-you-type
    field config.

    Per stemmed word of codepoint length L (reference next_ngram semantics,
    traced):

    * L >= min_gram: emit prefixes of lengths ``min_gram .. min(L, max_gram)``
      in increasing length; if ``L > max_gram`` and ``preserve_original``,
      additionally emit the full word last (``ngram.it = end`` branch).
    * L < min_gram: emit the full word ONLY under ``preserve_original``
      (the ``length >= min || preserve_original`` guard).

    Increment semantics: the first emission of a word consumes increment 1,
    later grams of the same word emit at increment 0 (same position slot);
    a word that emits nothing does NOT consume the pending increment, so
    positions stay dense over emitting words. Returns ``(tokens, positions)``
    pairs with ``emits_positions`` set, like :func:`synonym_tokenizer`."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError(f"bad edge ngram bounds [{min_gram},{max_gram}]")

    def _run(texts: pd.Series) -> pd.Series:
        base = text_tokenize(texts, locale, stopwords)

        def _one(toks: list[str]):
            ts: list[str] = []
            ps: list[int] = []
            p = 0
            for t in toks:
                n0 = len(ts)
                L = len(t)
                if L >= min_gram:
                    for g in range(min_gram, min(L, max_gram) + 1):
                        ts.append(t[:g])
                    if L > max_gram and preserve_original:
                        ts.append(t)
                elif preserve_original:
                    ts.append(t)
                if len(ts) > n0:  # inc=1 consumed by the word's first gram
                    p += 1
                    ps.extend([p] * (len(ts) - n0))
            return (ts, ps)

        return base.map(_one)

    _run.emits_positions = True
    return _run


def minhash_tokenize(
    texts: pd.Series, num_hashes: int = 8, shingle_k: int = 3, seed: int = 7
) -> pd.Series:
    """``minhash`` ANALYZER plane (minhash_token_stream.hpp:34-66): emit the
    document's MinHash signature AS INDEX TERMS (``<slot>_<minvalue>``), so
    near-duplicate retrieval runs through the ordinary inverted index — a
    Terms/min_match query over one doc's signature tokens finds docs sharing
    signature slots (estimated-Jaccard search, the reference's use case).

    Same Carter-Wegman construction as :mod:`iresearch_spark.textops`
    (md5-derived 32-bit shingle keys, (a·x+b) mod p minima), so analyzer-plane
    signatures agree with the textops operator plane."""
    from ..textops import MINHASH_PRIME, minhash_params

    params = minhash_params(num_hashes, seed)

    def one(s: str) -> list[str]:
        toks = _SIMPLE_RE.findall(s.lower())
        if len(toks) < shingle_k:
            shingles = {" ".join(toks)} if toks else set()
        else:
            shingles = {
                " ".join(toks[i : i + shingle_k])
                for i in range(len(toks) - shingle_k + 1)
            }
        if not shingles:
            return []
        import hashlib as _hl

        xs = np.fromiter(
            (
                int(_hl.md5(sh.encode()).hexdigest()[:8], 16) % MINHASH_PRIME
                for sh in shingles
            ),
            dtype=np.int64,
            count=len(shingles),
        )
        return [
            f"{i}_{int(((a * xs + b) % MINHASH_PRIME).min())}"
            for i, (a, b) in enumerate(params)
        ]

    return texts.fillna("").map(one)


# Locale collation tailorings (CLDR rules, public knowledge). Each maps a
# tailored SEQUENCE (single letter or multi-char CONTRACTION, e.g. Czech
# "ch", Danish "aa") to a SORT SURROGATE whose byte order places it where
# the locale's collation does; applied BEFORE the NFKD fold so the generic
# strength machinery (which would decompose å → a + ring) never sees the
# tailored letter. Sequences apply LONGEST-FIRST, left to right —
# contraction matching, the seek order of an ICU tailoring's contraction
# table. "\x7f" (DEL) sorts after every ASCII letter, so "z\x7f<digit>"
# keys land after all plain z-words — the CLDR Swedish order. Surrogates
# are ordered among themselves by their digit suffix.
#
# Documented approximation: tailored sequences that CLDR separates only at
# the TERTIARY level (da å <<< aa; cs ch <<< Ch <<< CH titlecase forms)
# share one surrogate per case class here — an in-place surrogate cannot
# express a lower-level difference without disturbing the comparison of
# the characters that follow it (real ICU compares level by level).
_COLLATION_TAILORING: dict[str, dict[str, str]] = {
    # Swedish (CLDR sv): å, ä, ö are distinct letters AFTER z, in that order.
    "sv": {
        "å": "z\x7f1", "Å": "Z\x7f1",
        "ä": "z\x7f2", "Ä": "Z\x7f2",
        "ö": "z\x7f3", "Ö": "Z\x7f3",
    },
    # German phonebook (DIN 5007-2 / CLDR de-u-co-phonebk): umlauts expand
    # to base+e at PRIMARY strength (ä=ae), ß=ss as in standard German.
    "de_phonebook": {
        "ä": "ae", "Ä": "Ae",
        "ö": "oe", "Ö": "Oe",
        "ü": "ue", "Ü": "Ue",
        "ß": "ss",
    },
    # Czech (CLDR cs): č/ř/š/ž are distinct letters right after their base
    # (c<č, r<ř, s<š, z<ž), and the CONTRACTION "ch" is a distinct letter
    # between h and i — after every plain h-word.
    "cs": {
        "ch": "h\x7f1", "Ch": "H\x7f1", "CH": "H\x7f1",
        "č": "c\x7f1", "Č": "C\x7f1",
        "ř": "r\x7f1", "Ř": "R\x7f1",
        "š": "s\x7f1", "Š": "S\x7f1",
        "ž": "z\x7f1", "Ž": "Z\x7f1",
    },
    # Danish (CLDR da): æ, ø, å are distinct letters AFTER z in that order;
    # the CONTRACTION "aa" collates as å (primary-equal); ü collates with y
    # and ö with ø (secondary differences — primary-equal here).
    "da": {
        "aa": "z\x7f3", "Aa": "Z\x7f3", "AA": "Z\x7f3",
        "æ": "z\x7f1", "Æ": "Z\x7f1",
        "ø": "z\x7f2", "Ø": "Z\x7f2",
        "å": "z\x7f3", "Å": "Z\x7f3",
        "ö": "z\x7f2", "Ö": "Z\x7f2",
        "ü": "y", "Ü": "Y",
    },
}


def collation_tokenize(
    texts: pd.Series, strength: str = "primary", locale: str | None = None
) -> pd.Series:
    """``collation`` analyzer approximation (collation_token_stream.cpp):
    the reference emits ONE token per input — the ICU collation sort key for
    a locale — so term ORDER (and therefore by_range/by_prefix semantics)
    follows locale collation.

    Without ICU this emits the closest pure-Python analogue of a
    primary-strength key: NFKD normalize → strip combining marks → casefold
    ('café', 'CAFE', 'Cafe' all collate equal, like ICU primary strength).
    ``strength="secondary"`` keeps accents (NFKD + casefold only);
    ``strength="tertiary"`` keeps case too (NFKD only).

    ``locale`` applies a CLDR tailoring table (_COLLATION_TAILORING) before
    the fold: ``sv`` places å < ä < ö after z as distinct primary letters
    (standard German needs NO table — CLDR sorts ä as a+secondary-diff,
    which is exactly what NFKD+strip produces, and casefold already maps
    ß→ss at primary/secondary); ``de_phonebook`` expands umlauts to base+e
    (DIN 5007-2); ``cs`` adds č/ř/š/ž after their base letters and the
    CONTRACTION ch between h and i; ``da`` places æ/ø/å after z with the
    CONTRACTION aa = å and ü=y / ö=ø. Sequences match longest-first
    (contraction semantics). ICU script reordering remains out of scope;
    unknown locales raise."""
    table = None
    pat = None
    if locale:
        table = _COLLATION_TAILORING.get(locale)
        if table is None:
            raise ValueError(
                f"no collation tailoring for locale {locale!r}; "
                f"available: {sorted(_COLLATION_TAILORING)} (default untailored)"
            )
        # longest-first alternation = contraction matching ("aa" wins over
        # any would-be single-"a" rule), left-to-right non-overlapping
        pat = re.compile(
            "|".join(re.escape(k) for k in sorted(table, key=len, reverse=True))
        )

    def key(s: str) -> list[str]:
        if table:
            s = pat.sub(lambda m: table[m.group(0)], s)
        d = unicodedata.normalize("NFKD", s)
        if strength == "primary":
            d = "".join(c for c in d if not unicodedata.combining(c)).casefold()
        elif strength == "secondary":
            d = d.casefold()
        elif strength != "tertiary":
            raise ValueError(f"unknown collation strength {strength!r}")
        return [unicodedata.normalize("NFC", d)]

    return texts.fillna("").map(key)


def stem_tokenize(texts: pd.Series) -> pd.Series:
    """Standalone Snowball stem stage over simple tokens
    (text_token_stemming_stream.cpp — no stopwords, no accent fold)."""
    from .stemmer import stem_english

    return simple_tokenize(texts).map(lambda ts: [stem_english(t) for t in ts])


_REGISTRY: dict[str, Tokenizer] = {
    "simple": simple_tokenize,
    "payload": payload_tokenizer(),
    "norm": norm_tokenize,
    "segmentation": segmentation_tokenize,
    "text": text_tokenize,
    "text_en": text_en_tokenize,
    "stem": stem_tokenize,
    "collation": collation_tokenize,
    "minhash": minhash_tokenize,
}


def register_analyzer(name: str, fn: Tokenizer) -> None:
    """REGISTER_ANALYZER_* analogue: add a named analyzer to the registry."""
    _REGISTRY[name] = fn


def arrow_tokenize_encode(texts, name: str):
    """Arrow-native tokenize + dictionary-encode for supported analyzers.

    ``texts`` may be a list of str (pandas path) or a ``pyarrow``
    Array/ChunkedArray (the mapInArrow build path hands its batches straight
    in — document text never becomes Python objects at all). Returns
    ``(codes int64[n_tokens], uniq_terms list[str], doc_lens int64)``
    where codes index uniq_terms and tokens are in (doc, position) order — or
    ``None`` when the analyzer has no Arrow fast path (caller falls back to the
    pandas tokenizer).

    Why: the hot path of index build is tokenization + term hashing; doing it
    with Python string objects thrashes the allocator (it stops scaling past a
    few concurrent workers). Arrow's utf8_lower/split_pattern_regex/
    dictionary_encode keep every token inside Arrow buffers — C memory, no
    per-token PyObject — and hand back integer codes.

    Identity: split on ``[^a-z0-9]+`` of lowered text with empties dropped ==
    ``findall([a-z0-9]+)`` == the DuckDB oracle's regexp_split_to_array filter
    (asserted against :func:`simple_tokenize` in tests).
    """
    if name != "simple":
        return None
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    else:
        arr = pa.array(["" if t is None else t for t in texts], type=pa.large_string())
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    raw_lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept = pc.filter(flat, keep)
    enc = pc.dictionary_encode(kept)
    codes = enc.indices.to_numpy().astype(np.int64)
    uniq_terms = enc.dictionary.to_pylist()
    doc_of_raw = np.repeat(np.arange(raw_lens.size, dtype=np.int64), raw_lens)
    doc_lens = np.bincount(doc_of_raw[keep_np], minlength=raw_lens.size).astype(np.int64)
    return codes, uniq_terms, doc_lens


def get_tokenizer(name: str) -> Tokenizer:
    """Resolve an analyzer spec: plain registry name, or a parameterized spec
    ``delimiter:<d>`` / ``ngram:<min>,<max>`` / ``simple+stop:<w1>,<w2>,...``
    (the JSON-options analogue of REGISTER_ANALYZER_JSON, kept shell-safe)."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if ":" in name:
        kind, _, arg = name.partition(":")
        if kind == "delimiter":
            return lambda s, d=arg: delimiter_tokenize(s, d)
        if kind == "norm":
            # norm:<case>[,<form>][,no-accent] — case lower|none|upper, form
            # NFC|NFD|NFKC|NFKD; no-accent maps the reference's accent=false
            parts = [p for p in arg.split(",") if p]
            cs = parts[0] if parts else "lower"
            fm, acc = "NFC", True
            for p in parts[1:]:
                if p in ("NFC", "NFD", "NFKC", "NFKD"):
                    fm = p
                elif p == "no-accent":
                    acc = False
                elif p == "accent":
                    acc = True
                else:
                    raise ValueError(f"bad norm option {p!r}")
            return lambda s, a=cs, b=fm, c=acc: norm_tokenize(s, a, b, c)
        if kind == "segmentation":
            # segmentation:<case>[,<word_break>] — case lower|none|upper,
            # word_break alpha|graphic|all (options_t, the reference's
            # case_convert/word_break JSON params)
            parts = arg.split(",")
            cs = parts[0] or "lower"
            wb = parts[1] if len(parts) > 1 and parts[1] else "alpha"
            return lambda s, a=cs, b=wb: segmentation_tokenize(s, a, b)
        if kind == "ngram":
            # ngram:<min>,<max>[,p][,start=<m>][,end=<m>] — p preserves the
            # original; start/end are the reference's Options markers
            parts = arg.split(",")
            lo, hi = int(parts[0]), int(parts[1])
            po, sm, em, it = False, "", "", "utf8"
            for p in parts[2:]:
                if p == "p":
                    po = True
                elif p.startswith("start="):
                    sm = p[6:]
                elif p.startswith("end="):
                    em = p[4:]
                elif p == "bytes":  # InputType::Binary (the reference default)
                    it = "bytes"
                else:
                    raise ValueError(f"bad ngram option {p!r}")
            return lambda s, a=lo, b=hi, c=po, d=sm, e=em, f=it: ngram_tokens(
                s, a, b, c, d, e, f
            )
        if kind == "simple+stop":
            words = tuple(arg.split(","))
            return pipeline(simple_tokenize, lambda t, w=words: stopword_filter(t, w))
        if kind == "text_en":  # text_en:<stopword,stopword,...> ('' = none)
            words = tuple(w for w in arg.split(",") if w)
            return lambda s, w=words: text_en_tokenize(s, w)
        if kind == "minhash":  # minhash:<num_hashes>[,shingle_k[,seed]]
            parts = [int(x) for x in arg.split(",") if x]
            nh = parts[0] if parts else 8
            sk = parts[1] if len(parts) > 1 else 3
            sd = parts[2] if len(parts) > 2 else 7
            return lambda s, a=nh, b=sk, c=sd: minhash_tokenize(s, a, b, c)
        if kind == "collation":
            # collation:<strength>[,<locale>] — strength primary|secondary|
            # tertiary; locale applies a CLDR tailoring (sv, de_phonebook)
            parts = arg.split(",")
            st = parts[0] or "primary"
            loc = parts[1] if len(parts) > 1 and parts[1] else None
            return lambda s, st=st, loc=loc: collation_tokenize(s, st, loc)
        if kind == "text":
            # text:<locale>[,edge:<min>-<max>[-p]][,stopword,...]
            # ('' after locale = empty stopword list); the optional edge part
            # is the reference's edgeNgram option (min/max/preserveOriginal,
            # text_token_stream.cpp:483-531)
            parts = arg.split(",")
            loc = parts[0] or "en"
            rest = parts[1:]
            edge = next((p for p in rest if p.startswith("edge:")), None)
            rest = [p for p in rest if not p.startswith("edge:")]
            words = tuple(w for w in rest if w) if rest else None
            if edge is not None:
                spec = edge[len("edge:"):]
                preserve = spec.endswith("-p")
                if preserve:
                    spec = spec[:-2]
                lo, hi = (int(x) for x in spec.split("-"))
                return text_edge_tokenize(loc, words, lo, hi, preserve)
            return lambda s, l=loc, w=words: text_tokenize(s, l, w)
        if kind == "payload":  # payload:<sep> — delimited per-occurrence payloads
            return payload_tokenizer(arg or "|")
        if kind == "simple+syn":  # simple+syn:word=alias,word2=alias2
            syn = dict(pair.split("=", 1) for pair in arg.split(",") if pair)
            return synonym_tokenizer(syn)
        if kind == "simple+stem":  # standalone stem stage (no stopwords/accents)
            from .stemmer import stem_english

            return pipeline(
                simple_tokenize, lambda tl: tl.map(lambda ts: [stem_english(t) for t in ts])
            )
    raise KeyError(f"unknown analyzer {name!r}; known: {sorted(_REGISTRY)}")


def tokens_to_postings(
    tokens: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc invert step (field_data.cpp:1008-1099): token list →
    (unique sorted terms, freqs, flattened ascending positions per term).

    Positions are 1-based token indexes (reference doc ids and positions are
    1-based; type_limits.hpp:62-75)."""
    if not tokens:
        e = np.empty(0, dtype=object)
        z = np.empty(0, dtype=np.int64)
        return e, z, z
    arr = np.asarray(tokens, dtype=object)
    pos = np.arange(1, arr.size + 1, dtype=np.int64)
    order = np.argsort(arr, kind="stable")  # stable keeps positions ascending per term
    sorted_terms = arr[order]
    sorted_pos = pos[order]
    uniq, starts, counts = np.unique(sorted_terms, return_index=True, return_counts=True)
    return uniq, counts.astype(np.int64), sorted_pos


def arrow_simple_token_offsets(texts):
    """Byte offsets of every ``simple``-analyzer token (OFFS index feature).

    Returns ``(tok_start int64, tok_len int64)`` aligned with the kept-token
    order of :func:`arrow_tokenize_encode` (doc order, then position order):
    ``tok_start[i]`` is the 0-based byte offset of token *i* inside its doc's
    LOWERCASED utf-8 text, ``tok_len[i]`` its byte length. For ASCII text
    (lowering is length-preserving) these are offsets into the original text.

    Reference analogue: the ``offset`` token attribute
    (token_attributes.hpp:39-47) whose start/end the ``.pos``/``.pay``
    streams persist when OFFS is indexed (formats_10.cpp:345-353).

    Fully vectorized on the Arrow string buffers: a ``simple`` token is a
    maximal ``[a-z0-9]`` byte run of the lowered text (utf-8 multibyte units
    never contain ASCII-range bytes, so byte runs == codepoint runs), and
    doc boundaries break runs. No per-row Python.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    else:
        arr = pa.array(["" if t is None else t for t in texts], type=pa.large_string())
    arr = pc.utf8_lower(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    # large_string: int64 value offsets; honour the array's own slice offset
    off = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    w = ((data >= 0x61) & (data <= 0x7A)) | ((data >= 0x30) & (data <= 0x39))
    if off[0] > 0:
        w[: off[0]] = False
    if off[-1] < data.size:
        w[off[-1] :] = False
    prev = np.zeros_like(w)
    prev[1:] = w[:-1]
    inner = off[(off > 0) & (off < data.size)]
    prev[inner] = False  # a doc's first byte never continues the previous doc's run
    starts = np.flatnonzero(w & ~prev)
    nxt = np.zeros_like(w)
    nxt[:-1] = w[1:]
    last = off[1:] - 1
    nxt[last[last >= 0]] = False  # a doc's last byte never extends into the next doc
    ends = np.flatnonzero(w & ~nxt) + 1
    doc_of = np.searchsorted(off, starts, side="right") - 1
    return (starts - off[doc_of]).astype(np.int64), (ends - starts).astype(np.int64)
