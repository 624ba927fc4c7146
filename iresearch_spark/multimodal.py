"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched kernels over ``mapInPandas``. The decode
libraries (PIL/ffmpeg/librosa) are NOT in this container, so the decode step is
stubbed: ``fake_decode_meta`` derives deterministic pseudo-metadata from the
byte content, while the Spark-side plumbing — schema, batching, partition
layout, UDF signatures — is real and tested. Swap ``_decode_image_stub`` for a
PIL call to productionize.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = (
    "doc_id long, n_bytes int, sha1 string, width int, height int, mode string"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake of an image decode (PIL.Image.open analogue).

    Derives (width, height, mode) from the content hash so tests are stable.
    A real deployment replaces this body with the actual decoder; everything
    around it (batching, schema, error handling) stays identical."""
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    h = hashlib.sha1(payload).digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024, ["RGB", "RGBA", "L"][h[2] % 3]


def decode_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Arrow-batched decode → typed metadata. mapInPandas: one narrow pass,
    batch-vectorized IO; at scale, pair with ``spark.sql.files.maxPartitionBytes``
    tuned so one batch of payloads fits executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(p) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").values,
                    "n_bytes": [len(p) for p in pdf[bin_col]],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in pdf[bin_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "mode": [m[2] for m in metas],
                }
            )

    return df.mapInPandas(run, DECODE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing: expands each payload row into frame-index
    rows (the shuffle-free ``posexplode`` pattern); the actual frame grab is the
    stubbed decode. Demonstrates the fan-out schema used at scale."""
    n_frames = (F.length("payload") % 271 + 30).alias("n_frames")  # deterministic fake
    with_n = df.select(F.col(id_col), F.col("payload"), n_frames)
    return with_n.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
