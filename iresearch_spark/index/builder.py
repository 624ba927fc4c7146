"""Index build pipeline: pages DataFrame → inverted-index tables on disk.

Spark-first re-expression of the reference write path (SURVEY.md §3.1):

* stage ``tokenize``  — ``repartitionByRange(key)`` fixes deterministic segments
  (segment_id = partition index, doc ids dense 1-based per segment, mirroring
  segment_writer.cpp:93-112); one ``mapInPandas`` pass tokenizes (vectorized,
  C-backed regex — no per-row Python) and inverts per doc
  (field_data.cpp:1008-1099 analogue).
* stage ``docs``      — per-doc stored columns + ``doc_len`` (Norm2,
  norm.hpp:77-124) written as a plain Parquet table (the columnstore analogue:
  Parquet already gives us columnar storage + compression).
* stage ``postings``  — JVM-side ``explode`` then ``groupBy(term, segment_id)``
  + ``applyInPandas`` encode: per (term, segment) sorted doc ids/freqs/positions
  VByte-compressed into 128-doc blocks with block-max metadata (codec.py;
  formats_10.cpp:803-953 analogue). Skew note: the grouping key includes
  ``segment_id``, so a head term is split across all segments — the same effect
  as salting, with a deterministic bound (max group = one segment's docs).
  AQE is the backstop. Output is hash-bucketed by term (``tbucket``) and sorted
  by term within files so term lookups prune both directories and row groups
  (the FST/burst-trie role, formats_burst_trie.cpp — done by layout, not code).
* stage ``term_dict`` — per-term global df/ttf (collectors.cpp:75-94 analogue).
* stage ``norms``     — per-segment dense ``doc_len`` arrays, VByte-encoded, one
  row per segment (Norm2 columnstore reader analogue — kernels index it by
  doc_id with zero joins).
* stage ``field_stats`` — docs_with_field / total_term_freq for BM25
  (bm25.cpp:495-519).
* commit — two-phase: stages write under ``gen=<g>/``, a ``_pending.json`` is
  written then atomically renamed to ``meta.json`` (index_writer.cpp:2606-2718
  ``pending_segments_<gen>`` → ``segments_<gen>``).

Every stage appends a manifest row (run_id, stage, status, rows, seconds) and
is skipped on re-run when its output + manifest row exist → an interrupted
build resumes at stage/segment granularity without recomputation.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.tokenizers import get_tokenizer, tokens_to_postings
from .codec import encode_postings, vbyte_encode

NUM_TERM_BUCKETS = 16


def term_bucket_py(term: str, buckets: int = NUM_TERM_BUCKETS) -> int:
    """Driver-side twin of :func:`term_bucket_col` (md5-based, engine-agnostic)."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % buckets


def term_bucket_col(col, buckets: int = NUM_TERM_BUCKETS):
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets).cast("int")


POSTINGS_SCHEMA = (
    "term string, segment_id int, docs_count int, total_freq long, max_freq int, "
    "doc_ids_enc binary, freqs_enc binary, pos_enc binary, "
    "block_last_doc array<long>, block_doc_off array<long>, "
    "block_freq_off array<long>, block_max_freq array<long>"
)

NORMS_SCHEMA = "segment_id int, docs_count int, doc_len_enc binary"


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        analyzer: str = "simple",
        num_segments: int | None = None,
        with_positions: bool = True,
        term_buckets: int = NUM_TERM_BUCKETS,
    ):
        self.spark = spark
        self.index_path = index_path
        self.analyzer = analyzer
        self.num_segments = num_segments
        self.with_positions = with_positions
        self.term_buckets = term_buckets

    # ---------------------------------------------------------------- build
    def build(
        self,
        df: DataFrame,
        key_col: str,
        text_col: str,
        stored_cols: tuple[str, ...] = (),
        run_id: str | None = None,
    ) -> dict:
        """Build (or resume) the index; returns the committed meta dict."""
        spark = self.spark
        run_id = run_id or uuid.uuid4().hex[:12]
        gen = self._next_generation()
        gen_dir = os.path.join(self.index_path, f"gen={gen}")
        os.makedirs(gen_dir, exist_ok=True)

        committed = self.read_meta()
        if committed is not None:
            return committed  # already committed — resume is a no-op

        n_rows = df.count()
        num_segments = self.num_segments or max(1, min(spark.sparkContext.defaultParallelism, math.ceil(n_rows / 65536)))

        tokenizer_name = self.analyzer
        with_positions = self.with_positions
        stored_cols = tuple(stored_cols)
        in_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        stored_schema = ", ".join(f"`{c}` {in_fields[c]}" for c in stored_cols)
        tok_schema = (
            "segment_id int, doc_id int, doc_key string, doc_len int, "
            "terms array<string>, freqs array<int>, poss array<array<int>>"
            + (", " + stored_schema if stored_cols else "")
        )

        def tokenize_partition(batches):
            from pyspark import TaskContext

            sid = TaskContext.get().partitionId()
            tokenizer = get_tokenizer(tokenizer_name)
            next_doc = 1  # doc ids are 1-based per segment (type_limits.hpp:62-75)
            for pdf in batches:
                toks = tokenizer(pdf[text_col])
                n = len(pdf)
                terms_col, freqs_col, poss_col, dlen = [], [], [], np.empty(n, np.int64)
                for i, tl in enumerate(toks):
                    uniq, counts, flat_pos = tokens_to_postings(tl)
                    terms_col.append(list(uniq))
                    freqs_col.append(counts.astype(np.int32))
                    if with_positions:
                        splits = np.split(flat_pos, np.cumsum(counts)[:-1]) if len(uniq) else []
                        poss_col.append([p.astype(np.int32) for p in splits])
                    else:
                        poss_col.append(None)
                    dlen[i] = len(tl)
                out = pd.DataFrame(
                    {
                        "segment_id": np.full(n, sid, np.int32),
                        "doc_id": np.arange(next_doc, next_doc + n, dtype=np.int32),
                        "doc_key": pdf[key_col].astype(str).values,
                        "doc_len": dlen.astype(np.int32),
                        "terms": terms_col,
                        "freqs": freqs_col,
                        "poss": poss_col,
                    }
                )
                for c in stored_cols:
                    out[c] = pdf[c].values
                next_doc += n
                yield out

        partitioned = (
            df.repartitionByRange(num_segments, key_col)
            .sortWithinPartitions(key_col)
        )
        tokenized = partitioned.mapInPandas(tokenize_partition, schema=tok_schema)

        docs_path = os.path.join(gen_dir, "docs")
        if not self._stage_done(run_id, gen, "docs", docs_path):
            t0 = time.time()
            docs = tokenized.drop("terms", "freqs", "poss")
            docs.write.mode("overwrite").parquet(docs_path)
            self._manifest(run_id, gen, "docs", "done", time.time() - t0)
        docs_df = spark.read.parquet(docs_path)

        postings_path = os.path.join(gen_dir, "postings")
        buckets = self.term_buckets
        if not self._stage_done(run_id, gen, "postings", postings_path):
            t0 = time.time()
            exploded = (
                tokenized.select(
                    "segment_id",
                    "doc_id",
                    F.explode(F.arrays_zip("terms", "freqs", "poss")).alias("z"),
                )
                .select(
                    F.col("z.terms").alias("term"),
                    "segment_id",
                    "doc_id",
                    F.col("z.freqs").alias("freq"),
                    F.col("z.poss").alias("pos"),
                )
            )

            def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("doc_id")
                doc_ids = pdf["doc_id"].to_numpy(np.int64)
                freqs = pdf["freq"].to_numpy(np.int64)
                positions = None
                if with_positions:
                    pos_lists = [p for p in pdf["pos"] if p is not None and len(p)]
                    if pos_lists:
                        positions = np.concatenate([np.asarray(p, np.int64) for p in pdf["pos"]])
                enc = encode_postings(doc_ids, freqs, positions)
                return pd.DataFrame(
                    [
                        {
                            "term": pdf["term"].iloc[0],
                            "segment_id": int(pdf["segment_id"].iloc[0]),
                            "docs_count": enc.docs_count,
                            "total_freq": enc.total_freq,
                            "max_freq": enc.max_freq,
                            "doc_ids_enc": enc.doc_ids_enc,
                            "freqs_enc": enc.freqs_enc,
                            "pos_enc": enc.pos_enc,
                            "block_last_doc": enc.block_last_doc.tolist(),
                            "block_doc_off": enc.block_doc_off.tolist(),
                            "block_freq_off": enc.block_freq_off.tolist(),
                            "block_max_freq": enc.block_max_freq.tolist(),
                        }
                    ]
                )

            postings = (
                exploded.groupBy("term", "segment_id")
                .applyInPandas(encode_group, schema=POSTINGS_SCHEMA)
                .withColumn("tbucket", term_bucket_col(F.col("term"), buckets))
            )
            (
                postings.repartition("tbucket")
                .sortWithinPartitions("term", "segment_id")
                .write.mode("overwrite")
                .partitionBy("tbucket")
                .parquet(postings_path)
            )
            self._manifest(run_id, gen, "postings", "done", time.time() - t0)
        postings_df = spark.read.parquet(postings_path)

        term_dict_path = os.path.join(gen_dir, "term_dict")
        if not self._stage_done(run_id, gen, "term_dict", term_dict_path):
            t0 = time.time()
            (
                postings_df.groupBy("term")
                .agg(
                    F.sum("docs_count").alias("df"),
                    F.sum("total_freq").alias("ttf"),
                    F.max("max_freq").alias("max_freq"),
                )
                .withColumn("tbucket", term_bucket_col(F.col("term"), buckets))
                .repartition("tbucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("tbucket")
                .parquet(term_dict_path)
            )
            self._manifest(run_id, gen, "term_dict", "done", time.time() - t0)

        norms_path = os.path.join(gen_dir, "norms")
        if not self._stage_done(run_id, gen, "norms", norms_path):
            t0 = time.time()

            def encode_norms(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("doc_id")
                dl = pdf["doc_len"].to_numpy(np.int64)
                return pd.DataFrame(
                    [
                        {
                            "segment_id": int(pdf["segment_id"].iloc[0]),
                            "docs_count": len(dl),
                            "doc_len_enc": vbyte_encode(dl),
                        }
                    ]
                )

            (
                docs_df.select("segment_id", "doc_id", "doc_len")
                .groupBy("segment_id")
                .applyInPandas(encode_norms, schema=NORMS_SCHEMA)
                .write.mode("overwrite")
                .parquet(norms_path)
            )
            self._manifest(run_id, gen, "norms", "done", time.time() - t0)

        stats_path = os.path.join(gen_dir, "field_stats")
        if not self._stage_done(run_id, gen, "field_stats", stats_path):
            t0 = time.time()
            (
                docs_df.where(F.col("doc_len") > 0)
                .agg(
                    F.count(F.lit(1)).alias("docs_with_field"),
                    F.sum("doc_len").alias("total_term_freq"),
                )
                .write.mode("overwrite")
                .parquet(stats_path)
            )
            self._manifest(run_id, gen, "field_stats", "done", time.time() - t0)

        meta = {
            "generation": gen,
            "analyzer": self.analyzer,
            "with_positions": self.with_positions,
            "num_segments": num_segments,
            "term_buckets": buckets,
            "docs_count": n_rows,
            "key_col": key_col,
            "text_col": text_col,
            "stored_cols": list(stored_cols),
            "run_id": run_id,
            "tables": {
                "docs": docs_path,
                "postings": postings_path,
                "term_dict": term_dict_path,
                "norms": norms_path,
                "field_stats": stats_path,
            },
        }
        pending = os.path.join(self.index_path, "_pending.json")
        with open(pending, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(pending, os.path.join(self.index_path, "meta.json"))  # atomic publish
        return meta

    # ------------------------------------------------------------- plumbing
    def read_meta(self) -> dict | None:
        p = os.path.join(self.index_path, "meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def _next_generation(self) -> int:
        meta = self.read_meta()
        return (meta["generation"] + 1) if meta else 1

    def _manifest_path(self) -> str:
        return os.path.join(self.index_path, "manifest.jsonl")

    def _manifest(self, run_id: str, gen: int, stage: str, status: str, seconds: float):
        row = {
            "run_id": run_id,
            "generation": gen,
            "stage": stage,
            "status": status,
            "seconds": round(seconds, 3),
            "ts": time.time(),
        }
        with open(self._manifest_path(), "a") as f:
            f.write(json.dumps(row) + "\n")

    def _stage_done(self, run_id: str, gen: int, stage: str, path: str) -> bool:
        """Stage-granular resume: skip when output exists + a done manifest row."""
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            return False
        mp = self._manifest_path()
        if not os.path.exists(mp):
            return False
        with open(mp) as f:
            for line in f:
                row = json.loads(line)
                if row["generation"] == gen and row["stage"] == stage and row["status"] == "done":
                    return True
        return False
