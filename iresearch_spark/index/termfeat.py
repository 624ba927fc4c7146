"""Per-term fuzzy-prefilter features, persisted in term_dict at build time.

The reference intersects a parametric Levenshtein automaton with the FST term
dictionary so fuzzy expansion is sublinear in the vocabulary
(levenshtein_utils.cpp:1-775; levenshtein_filter.cpp:139-310). The Spark-first
analogue amortizes the candidate prefilter at BUILD time instead: every
term_dict row carries

* ``tlen``      — the term length (the automaton's length window
                  ``|q| ± max_distance`` becomes a column range predicate);
* ``charmask``  — a 31-bit character-set bitmask (bits 0-25 = a-z,
                  bits 26-29 = digits folded mod 4, bit 30 = any char outside
                  [a-z0-9]).

Fuzzy expansion then pushes TWO set-arithmetic lower bounds on the edit
distance into the JVM scan (whole-stage codegen over int columns, no Python,
no Arrow transfer of the vocabulary):

* a query-char bit absent from the candidate mask ⇒ that query char does not
  occur in the candidate ⇒ ≥ 1 edit (delete/substitute) per such bit:
  ``bit_count(qmask & ~charmask) <= max_distance``;
* a candidate bit absent from the query mask ⇒ some candidate char is not any
  query char ⇒ ≥ 1 edit per such bit:
  ``bit_count(charmask & ~qmask) <= max_distance``.

Bit collisions (digit folding, the outside-alphabet bucket) only UNDERCOUNT,
so both predicates are conservative: no true candidate is lost, and the exact
DP runs only on the (tiny) survivor set. Transpositions preserve the
character multiset, so the bounds hold for the Damerau/OSA variant too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_OTHER_BIT = 30


def char_bit(ch: str) -> int:
    """Bit index of one character (Python twin of the column expression)."""
    o = ord(ch)
    if 97 <= o <= 122:
        return o - 97
    if 48 <= o <= 57:
        return 26 + (o - 48) % 4
    return _OTHER_BIT


def query_mask(query: str) -> int:
    """Character-set bitmask of a query string."""
    m = 0
    for ch in set(query):
        m |= 1 << char_bit(ch)
    return m


def term_feature_cols(term=None) -> tuple:
    """(tlen, charmask) column expressions over a term column.

    Pure functions of ``term`` — recomputed wherever term_dict is (re)written
    (fresh build, append merge, consolidate) and derivable on the fly for
    indexes committed before these columns existed."""
    term = F.col("term") if term is None else term
    mask = F.lit(0)
    for i, ch in enumerate(_LETTERS):
        mask = mask.bitwiseOR(F.when(term.contains(ch), F.lit(1 << i)).otherwise(0))
    for d in "0123456789":
        mask = mask.bitwiseOR(
            F.when(term.contains(d), F.lit(1 << char_bit(d))).otherwise(0)
        )
    mask = mask.bitwiseOR(
        F.when(term.rlike("[^a-z0-9]"), F.lit(1 << _OTHER_BIT)).otherwise(0)
    )
    return F.length(term).alias("tlen"), mask.alias("charmask")


def with_term_features(df):
    """Append tlen/charmask to a term_dict-shaped DataFrame (idempotent)."""
    if "tlen" in df.columns and "charmask" in df.columns:
        return df
    df = df.drop("tlen", "charmask")
    tlen, mask = term_feature_cols()
    return df.select("*", tlen, mask)


def popcount32(a) -> "np.ndarray":
    """Vectorized popcount for non-negative int arrays (≤ 32 significant
    bits); numpy 1.x has no bitwise_count."""
    import numpy as np

    u = np.ascontiguousarray(a, dtype=np.uint32)
    return np.unpackbits(u.view(np.uint8)).reshape(-1, 32).sum(axis=1, dtype=np.int64)


def fuzzy_prefilter_np(tlen, charmask, query: str, maxd: int) -> "np.ndarray":
    """Boolean survivor mask — the numpy twin of
    :func:`fuzzy_prefilter_pred`, used against the driver-cached vocabulary
    (the reference's in-memory FST ∩ automaton intersection)."""
    import numpy as np

    qmask = query_mask(query)
    sel = (tlen >= len(query) - maxd) & (tlen <= len(query) + maxd)
    idx = np.flatnonzero(sel)
    if idx.size:
        cm = charmask[idx]
        ok = (popcount32(qmask & ~cm) <= maxd) & (popcount32(cm & ~qmask) <= maxd)
        sel[idx] = ok
    return sel


def fuzzy_prefilter_pred(query: str, maxd: int):
    """The pushed-down candidate predicate for a fuzzy query: length window +
    the two bit_count lower bounds (see module docstring)."""
    qmask = query_mask(query)
    return (
        (F.col("tlen") >= len(query) - maxd)
        & (F.col("tlen") <= len(query) + maxd)
        & F.expr(f"bit_count({qmask} & ~charmask) <= {maxd}")
        & F.expr(f"bit_count(charmask & ~{qmask}) <= {maxd}")
    )
