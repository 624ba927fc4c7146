"""Pages-corpus tests: input_hint shape, determinism across parallelism levels,
and the per-row invariant — byte-identical extracted text per url
(BASELINE.json input_hint)."""

import numpy as np
import pandas as pd

from iresearch_spark import corpus


def test_token_ranks_deterministic_and_zipfish():
    a = corpus.token_ranks(np.arange(50), seed=42)
    b = corpus.token_ranks(np.arange(50), seed=42)
    assert all((x == y).all() for x, y in zip(a, b))
    # order of doc ids must not matter (counter-based hashing, not RNG state)
    c = corpus.token_ranks(np.array([7, 3]), seed=42)
    assert (c[0] == a[7]).all() and (c[1] == a[3]).all()
    flat = np.concatenate(a)
    # Zipf-ish: rank 0 strictly more frequent than ranks >= 100
    assert (flat == 0).sum() > (flat >= 45_000).sum()


def test_synth_pages_schema_and_extraction_invariant(spark):
    df = corpus.synth_pages(spark, 64, seed=42, partitions=4)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    pdf = df.toPandas()
    assert len(pdf) == 64
    assert pdf["url"].is_unique
    extracted = corpus.extract_text(pdf["html"])
    # byte-identical extracted text per url (the input_hint per-row invariant)
    assert (extracted.values == pdf["text"].values).all()
    raw = pdf["html"].map(bytes)
    assert raw.map(lambda b: b.startswith(b"<html>")).all()


def test_synth_pages_partition_invariant(spark):
    """Same (seed, n) at different parallelism → identical table content."""
    a = corpus.synth_pages(spark, 40, seed=1, partitions=2).toPandas()
    b = corpus.synth_pages(spark, 40, seed=1, partitions=8).toPandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
