"""Deterministic Common-Crawl-style pages corpus + HTML text extraction.

BASELINE.json input_hint prescribes the engine's input shape: an Iceberg/parquet
table of web pages ``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING)``. This module synthesises that table at any scale, fully
deterministically (pure integer mixing, no RNG state — the same ``(seed, doc)``
always produces the same page regardless of partitioning), and provides the
vectorized ``html → text`` extraction whose per-row invariant is *byte-identical
extracted text per url* (input_hint): ``extract_text(html) == text`` for every
generated page, asserted in tests.

Term distribution is Zipf-like via a log-uniform rank map (rank ≈ V^u), which
reproduces the long-tailed df histogram of real web text — head terms for
HighTerm-category queries, a deep tail for Low*.

The token stream is the analogue of the reference benchmark corpus (Wikipedia
line docs, utils/index-put.cpp:294-306) — a deterministic stand-in since this
sandbox allows no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_VOCAB_SIZE = 50_000
_MIN_TOKENS, _TOKEN_SPREAD = 60, 340  # doc length in [60, 400) tokens

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a counter-based deterministic hash."""
    z = (x + _GOLDEN).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _MIX1
    z = (z ^ (z >> np.uint64(27))) * _MIX2
    return z ^ (z >> np.uint64(31))


def token_ranks(doc_ids: np.ndarray, seed: int = 42) -> list[np.ndarray]:
    """Per-doc arrays of vocab ranks (Zipf-like), keyed only by (seed, doc_id)."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    s = np.uint64(seed)
    lens = _MIN_TOKENS + (
        _splitmix64(doc_ids * np.uint64(2) + s) % np.uint64(_TOKEN_SPREAD)
    ).astype(np.int64)
    # flat (doc, position) counter stream → one hash per token
    doc_rep = np.repeat(doc_ids, lens)
    pos = np.concatenate([np.arange(n, dtype=np.uint64) for n in lens]) if len(lens) else np.empty(0, np.uint64)
    h = _splitmix64(doc_rep * np.uint64(1_000_003) + pos + s)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # uniform [0,1)
    ranks = (np.power(float(_VOCAB_SIZE), u) - 1.0).astype(np.int64)  # log-uniform → Zipf-ish
    np.clip(ranks, 0, _VOCAB_SIZE - 1, out=ranks)
    bounds = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    return [ranks[bounds[i] : bounds[i + 1]] for i in range(len(lens))]


def rank_to_word(rank: int) -> str:
    return f"w{rank:05d}"


_HTML_PRE = '<html><head><meta charset="utf-8"/><title>doc</title></head><body><p>'
_HTML_POST = "</p></body></html>"


def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized html → text extraction (pandas str ops, no per-row Python).

    The generated pages wrap the text in a fixed template; extraction strips it.
    Per-row invariant (input_hint): byte-identical to the ``text`` column.
    """
    s = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    return s.str.replace(r"^.*?<p>", "", n=1, regex=True).str.replace(
        r"</p></body></html>$", "", regex=True
    )


def synth_pages(spark: SparkSession, n_pages: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of exactly the input_hint shape.

    Content depends only on ``(seed, id)`` — identical at any parallelism level,
    which is what makes the two-cluster-size scaling comparison apples-to-apples.
    """
    base = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            per_doc = token_ranks(ids, seed)
            texts = [" ".join(rank_to_word(r) for r in ranks) for ranks in per_doc]
            html = [(_HTML_PRE + t + _HTML_POST).encode("utf-8") for t in texts]
            yield pd.DataFrame(
                {
                    "url": [f"https://example.org/{int(i):010d}" for i in ids],
                    "warc_ts": pd.to_datetime(ids.astype(np.int64) + 1_700_000_000, unit="s"),
                    "html": html,
                    "text": texts,
                    "lang": ["en"] * len(ids),
                }
            )

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)
