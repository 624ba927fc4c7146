"""Okapi BM25 / TF-IDF scorer math — numpy, f32 (reference parity) or f64
(SQL-oracle parity).

Reference: core/search/bm25.cpp:283-299 (per-doc), 446-457 (score fn),
495-519 (idf + norm constants). The factored form ``c0 - c0*c1/(c1+tf)``
equals ``c0*tf/(c1+tf)``; we use the reference's factored form under f32 so
float rounding matches, and the plain form under f64 for the DuckDB oracle.

* ``idf = ln(1 + (docs_with_field - docs_with_term + 0.5) / (docs_with_term + 0.5))``
* ``c0 = boost * (k+1) * idf``
* ``c1 = k*(1-b) + k*b * dl / avgdl``,  ``avgdl = total_term_freq / docs_with_field``
* defaults k=1.2, b=0.75 (bm25.hpp:36-40); b=0 → BM15, b=1 → BM11.

TF-IDF (tfidf.cpp:381, 248-250): ``sqrt(tf) * (ln((N+1)/(df+1)) + 1)``.
"""

from __future__ import annotations

import numpy as np

K_DEFAULT = 1.2
B_DEFAULT = 0.75


def bm25_idf(docs_with_term: float, docs_with_field: float, dtype=np.float64):
    dt = np.dtype(dtype).type
    df = dt(docs_with_term)
    n = dt(docs_with_field)
    half = dt(0.5)
    return np.log1p((n - df + half) / (df + half)).astype(dtype)


def bm25_score(
    tf: np.ndarray,
    dl: np.ndarray,
    idf: float,
    avgdl: float,
    k: float = K_DEFAULT,
    b: float = B_DEFAULT,
    boost: float = 1.0,
    dtype=np.float64,
) -> np.ndarray:
    dt = np.dtype(dtype).type
    tf = np.asarray(tf).astype(dtype)
    dl = np.asarray(dl).astype(dtype)
    c0 = dt(boost) * (dt(k) + dt(1)) * dt(idf)
    c1 = dt(k) * (dt(1) - dt(b)) + dt(k) * dt(b) * dl / dt(avgdl)
    if np.dtype(dtype) == np.float32:
        # reference factored form, f32 throughout (bm25.cpp:446-457)
        return (c0 - c0 * c1 / (c1 + tf)).astype(dtype)
    return (c0 * tf / (c1 + tf)).astype(dtype)


def tfidf_score(
    tf: np.ndarray,
    docs_with_term: float,
    docs_with_field: float,
    boost: float = 1.0,
    dtype=np.float64,
) -> np.ndarray:
    dt = np.dtype(dtype).type
    idf = np.log((dt(docs_with_field) + dt(1)) / (dt(docs_with_term) + dt(1))) + dt(1)
    return (dt(boost) * np.sqrt(np.asarray(tf).astype(dtype)) * idf).astype(dtype)
