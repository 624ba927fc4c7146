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
        self._tables: dict[str, DataFrame] = {}

    @property
    def term_buckets(self) -> int:
        return self.meta["term_buckets"]

    def _table(self, name: str) -> DataFrame:
        """Point-in-time table handle, created ONCE per reader: re-reading
        parquet per query would redo file listing + footer reads (a multi-second
        serial driver cost on big indexes); a pinned reader is also exactly the
        reference's snapshot semantics (segment_reader.hpp:35-110)."""
        if name not in self._tables:
            self._tables[name] = self.spark.read.parquet(self.meta["tables"][name])
        return self._tables[name]

    def docs(self) -> DataFrame:
        df = self._table("docs")
        doc_cols = self.meta.get("doc_cols")
        return df.select(*doc_cols) if doc_cols else df

    def postings(self) -> DataFrame:
        return self._table("postings")

    def term_dict(self) -> DataFrame:
        return self._table("term_dict")

    def norms(self) -> DataFrame:
        df = self._table("norms")
        keep = [c for c in ("segment_id", "docs_count", "doc_len_enc", "docs_with_field", "sum_len") if c in df.columns]
        return df.select(*keep)

    def field_stats(self) -> dict:
        """{docs_with_field, total_term_freq, avgdl} — collected once, tiny.

        Derived from the per-segment norms rows (one row per segment); legacy
        indexes with a dedicated field_stats table still read that."""
        if self._field_stats is None:
            if "field_stats" in self.meta["tables"]:
                row = self.spark.read.parquet(self.meta["tables"]["field_stats"]).collect()[0]
                n = int(row["docs_with_field"])
                ttf = int(row["total_term_freq"])
            else:
                rows = self.norms().select("docs_with_field", "sum_len").collect()
                n = sum(int(r["docs_with_field"]) for r in rows)
                ttf = sum(int(r["sum_len"]) for r in rows)
            self._field_stats = {
                "docs_with_field": n,
                "total_term_freq": ttf,
                "avgdl": ttf / n if n else 0.0,
            }
        return self._field_stats

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Pruned postings scan (the FST term-index role, done by layout):
        tbucket partition pruning always; small term sets push an IN filter
        down to the parquet row groups, large ones use a broadcast semi-join
        (an O(1000)-element In predicate costs seconds of driver planning and
        pushes nothing useful once every row group matches)."""
        buckets = sorted({term_bucket_py(t, self.term_buckets) for t in terms})
        pruned = self.postings().where(F.col("tbucket").isin(buckets))
        if len(terms) <= 64:
            return pruned.where(F.col("term").isin(list(terms)))
        tdf = self.spark.createDataFrame([(t,) for t in terms], "term string")
        return pruned.join(F.broadcast(tdf), "term", "leftsemi")

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (df, ttf); the term_collector phase (collectors.cpp:144-219)."""
        buckets = sorted({term_bucket_py(t, self.term_buckets) for t in terms})
        pruned = self.term_dict().where(F.col("tbucket").isin(buckets))
        if len(terms) <= 64:
            pruned = pruned.where(F.col("term").isin(list(terms)))
        else:
            tdf = self.spark.createDataFrame([(t,) for t in terms], "term string")
            pruned = pruned.join(F.broadcast(tdf), "term", "leftsemi")
        rows = pruned.collect()
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def doc_lens(self, segment_id: int) -> np.ndarray:
        """Dense doc_len array for one segment (Norm2 reader analogue)."""
        row = self.norms().where(F.col("segment_id") == segment_id).collect()[0]
        return vbyte_decode(row["doc_len_enc"]).astype(np.int64)
