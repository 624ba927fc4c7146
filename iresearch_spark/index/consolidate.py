"""Segment consolidation — the merge plane of the engine.

Reference: ``merge_writer`` k-way segment merge with doc-id remapping
(core/index/merge_writer.cpp:72, 162-209, 359-455) driven by consolidation
policies (``consolidate_count`` / ``consolidate_docs_live`` / tiered,
utils/index_utils.hpp:36-126).

Spark-first re-expression: our corpus is append-only (no deletes), so every
doc is live and the reference's per-doc ``doc_map_f`` closure degenerates to a
constant per-segment offset — new_doc_id = old_doc_id + sum(docs_count of
earlier merged segments). That makes the merge a pure layout job:

* postings — group the merged segments' rows by term (within a bucket kernel),
  decode, shift by the segment offsets, concatenate in segment order (ids stay
  strictly increasing) and re-encode blocks. Positions are per-doc deltas →
  byte-concatenation, no decode.
* norms    — concatenate doc_len arrays in segment order.
* docs     — column expression: offset lookup join (broadcast, tiny).
* term_dict / field_stats — **unchanged**: global df/ttf/avgdl are invariant
  under merge, which also proves BM25 scores are invariant (test asserts
  rank+score identity before/after).

The result is committed as generation g+1 via the same two-phase protocol as
the build (pending json → atomic rename), and readers pinned to gen g keep
working (README.md:100-103 generation semantics).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .builder import POSTINGS_SCHEMA, NORMS_SCHEMA, IndexBuilder, term_bucket_col
from .codec import decode_doc_ids, decode_freqs, encode_postings, vbyte_decode, vbyte_encode
from .reader import IndexReader


# ---------------------------------------------------------------- policies


def pick_small_segments(reader: IndexReader, max_docs: int) -> list[int]:
    """``consolidate_docs_live``-style policy: merge all segments whose live
    doc count is below ``max_docs`` (index_utils.hpp:96-111 analogue)."""
    rows = reader.norms().select("segment_id", "docs_count").collect()
    out = sorted(int(r["segment_id"]) for r in rows if int(r["docs_count"]) < max_docs)
    return out if len(out) >= 2 else []


def pick_count(reader: IndexReader, target_segments: int) -> list[int]:
    """``consolidate_count``-style policy: merge the smallest segments until
    ≤ ``target_segments`` remain (index_utils.hpp:84-94 analogue)."""
    rows = sorted(
        ((int(r["docs_count"]), int(r["segment_id"])) for r in
         reader.norms().select("segment_id", "docs_count").collect())
    )
    n_merge = len(rows) - target_segments + 1
    if n_merge < 2:
        return []
    return sorted(sid for _, sid in rows[:n_merge])


# ------------------------------------------------------------------ merge


def consolidate(
    reader: IndexReader,
    segment_ids: list[int] | None = None,
) -> dict:
    """Merge ``segment_ids`` (default: all) into one segment; commit gen+1."""
    spark = reader.spark
    meta = dict(reader.meta)
    gen = meta["generation"] + 1
    index_path = reader.index_path
    gen_dir = os.path.join(index_path, f"gen={gen}")
    os.makedirs(gen_dir, exist_ok=True)

    seg_rows = sorted(
        (int(r["segment_id"]), int(r["docs_count"]))
        for r in reader.norms().select("segment_id", "docs_count").collect()
    )
    all_ids = [s for s, _ in seg_rows]
    merge_ids = sorted(segment_ids) if segment_ids is not None else all_ids
    if len(merge_ids) < 2:
        return meta  # nothing to merge
    docs_count = dict(seg_rows)
    target = merge_ids[0]
    offsets = {}
    acc = 0
    for s in merge_ids:
        offsets[s] = acc
        acc += docs_count[s]
    b_offsets = spark.sparkContext.broadcast(offsets)
    merge_set = set(merge_ids)
    buckets = meta["term_buckets"]

    t_all = time.time()
    builder = IndexBuilder(spark, index_path)

    # ---- postings ----
    postings = reader.postings()
    passthrough = postings.where(~F.col("segment_id").isin(merge_ids))
    to_merge = postings.where(F.col("segment_id").isin(merge_ids))

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        offs = b_offsets.value
        tgt = min(offs)
        pdf = pdf.sort_values(["term", "segment_id"], kind="stable")
        codes, uniq_terms = pd.factorize(pdf["term"])
        bounds = np.flatnonzero(np.diff(codes, prepend=-1))
        bounds = np.append(bounds, len(codes))
        rows = list(pdf.itertuples(index=False))
        out: dict[str, list] = {k: [] for k in (
            "term", "segment_id", "docs_count", "total_freq", "max_freq",
            "doc_ids_enc", "freqs_enc", "pos_enc",
            "block_last_doc", "block_doc_off", "block_freq_off", "block_max_freq",
        )}
        for gi in range(uniq_terms.size):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            ids_parts, tf_parts, pos_parts = [], [], []
            for r in rows[lo:hi]:
                off = offs[int(r.segment_id)]
                ids = decode_doc_ids(
                    r.doc_ids_enc,
                    np.asarray(r.block_doc_off, np.int64),
                    np.asarray(r.block_last_doc, np.int64),
                )
                ids_parts.append(ids + off)
                tf_parts.append(decode_freqs(r.freqs_enc, np.asarray(r.block_freq_off, np.int64)))
                pos_parts.append(r.pos_enc or b"")
            ids = np.concatenate(ids_parts)
            tfs = np.concatenate(tf_parts)
            enc = encode_postings(ids, tfs)  # positions re-attached below
            out["term"].append(uniq_terms[gi])
            out["segment_id"].append(tgt)
            out["docs_count"].append(enc.docs_count)
            out["total_freq"].append(enc.total_freq)
            out["max_freq"].append(enc.max_freq)
            out["doc_ids_enc"].append(enc.doc_ids_enc)
            out["freqs_enc"].append(enc.freqs_enc)
            # per-doc position deltas are remap-invariant → byte concat
            out["pos_enc"].append(b"".join(pos_parts))
            out["block_last_doc"].append(enc.block_last_doc.tolist())
            out["block_doc_off"].append(enc.block_doc_off.tolist())
            out["block_freq_off"].append(enc.block_freq_off.tolist())
            out["block_max_freq"].append(enc.block_max_freq.tolist())
        return pd.DataFrame(out)

    merged = (
        to_merge.withColumn("tbucket", term_bucket_col(F.col("term"), buckets))
        .groupBy("tbucket")
        .applyInPandas(merge_bucket, POSTINGS_SCHEMA)
    )
    postings_path = os.path.join(gen_dir, "postings")
    (
        passthrough.drop("tbucket")
        .unionByName(merged)
        .withColumn("tbucket", term_bucket_col(F.col("term"), buckets))
        .repartition(buckets, "tbucket")
        .sortWithinPartitions("term", "segment_id")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(postings_path)
    )
    builder._manifest(meta["run_id"], gen, "consolidate_postings", "done", time.time() - t_all)

    # ---- norms ----
    t0 = time.time()
    norms = reader.norms()

    def merge_norms(pdf: pd.DataFrame) -> pd.DataFrame:
        offs = b_offsets.value
        pdf = pdf.sort_values("segment_id")
        dl = np.concatenate([vbyte_decode(e).astype(np.int64) for e in pdf["doc_len_enc"]])
        return pd.DataFrame(
            [{
                "segment_id": min(offs),
                "docs_count": len(dl),
                "doc_len_enc": vbyte_encode(dl),
                "docs_with_field": int((dl > 0).sum()),
                "sum_len": int(dl.sum()),
            }]
        )

    norms_path = os.path.join(gen_dir, "norms")
    merged_norms = (
        norms.where(F.col("segment_id").isin(merge_ids))
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: merge_norms(pdf), NORMS_SCHEMA)
    )
    (
        norms.where(~F.col("segment_id").isin(merge_ids))
        .unionByName(merged_norms, allowMissingColumns=True)
        .write.mode("overwrite")
        .parquet(norms_path)
    )
    builder._manifest(meta["run_id"], gen, "consolidate_norms", "done", time.time() - t0)

    # ---- docs ----
    t0 = time.time()
    docs = reader.docs()
    off_df = F.broadcast(
        spark.createDataFrame(
            [(s, offsets[s]) for s in merge_ids], "segment_id int, off int"
        )
    )
    docs_path = os.path.join(gen_dir, "docs")
    (
        docs.join(off_df, "segment_id", "left")
        .withColumn(
            "doc_id",
            F.when(F.col("off").isNotNull(), F.col("doc_id") + F.col("off")).otherwise(
                F.col("doc_id")
            ),
        )
        .withColumn(
            "segment_id",
            F.when(F.col("off").isNotNull(), F.lit(target)).otherwise(F.col("segment_id")),
        )
        .drop("off")
        .write.mode("overwrite")
        .parquet(docs_path)
    )
    builder._manifest(meta["run_id"], gen, "consolidate_docs", "done", time.time() - t0)

    # ---- commit gen+1 (term_dict / field_stats are merge-invariant) ----
    meta["generation"] = gen
    meta["num_segments"] = len(all_ids) - len(merge_ids) + 1
    meta["tables"] = dict(meta["tables"])
    meta["tables"]["postings"] = postings_path
    meta["tables"]["norms"] = norms_path
    meta["tables"]["docs"] = docs_path
    pending = os.path.join(index_path, "_pending.json")
    with open(pending, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(pending, os.path.join(index_path, "meta.json"))
    return meta
