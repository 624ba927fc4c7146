"""Point-in-time index reader (segment_reader.hpp analogue).

Loads the committed generation's tables; global BM25 stats are collected once
(tiny) and cached — the ``filter::prepare`` stats phase (SURVEY.md §3.2).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import term_bucket_py
from .codec import vbyte_decode


class IndexReader:
    def __init__(self, spark: SparkSession, index_path: str):
        self.spark = spark
        self.index_path = index_path
        with open(os.path.join(index_path, "meta.json")) as f:
            self.meta = json.load(f)
        self._field_stats: dict | None = None

    @property
    def term_buckets(self) -> int:
        return self.meta["term_buckets"]

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(self.meta["tables"]["docs"])

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.meta["tables"]["postings"])

    def term_dict(self) -> DataFrame:
        return self.spark.read.parquet(self.meta["tables"]["term_dict"])

    def norms(self) -> DataFrame:
        return self.spark.read.parquet(self.meta["tables"]["norms"])

    def field_stats(self) -> dict:
        """{docs_with_field, total_term_freq, avgdl} — collected once, tiny."""
        if self._field_stats is None:
            row = self.spark.read.parquet(self.meta["tables"]["field_stats"]).collect()[0]
            n = int(row["docs_with_field"])
            ttf = int(row["total_term_freq"])
            self._field_stats = {
                "docs_with_field": n,
                "total_term_freq": ttf,
                "avgdl": ttf / n if n else 0.0,
            }
        return self._field_stats

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Pruned postings scan: tbucket partition pruning + term IN pushdown
        (the FST term-index role, done by layout)."""
        buckets = sorted({term_bucket_py(t, self.term_buckets) for t in terms})
        return self.postings().where(
            F.col("tbucket").isin(buckets) & F.col("term").isin(list(terms))
        )

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (df, ttf); the term_collector phase (collectors.cpp:144-219)."""
        buckets = sorted({term_bucket_py(t, self.term_buckets) for t in terms})
        rows = (
            self.term_dict()
            .where(F.col("tbucket").isin(buckets) & F.col("term").isin(list(terms)))
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def doc_lens(self, segment_id: int) -> np.ndarray:
        """Dense doc_len array for one segment (Norm2 reader analogue)."""
        row = self.norms().where(F.col("segment_id") == segment_id).collect()[0]
        return vbyte_decode(row["doc_len_enc"]).astype(np.int64)
