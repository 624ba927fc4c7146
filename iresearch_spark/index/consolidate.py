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

from .builder import POSTINGS_SCHEMA, NORMS_SCHEMA, IndexBuilder
from .codec import encode_postings_batch, vbyte_decode, vbyte_encode
from .reader import IndexReader


# ---------------------------------------------------------------- policies


def _longest_contiguous(ids: list[int]) -> list[int]:
    """Longest run of consecutive segment ids (≥2) — merging a NON-contiguous
    subset would fold later segments' docs below untouched middle segments,
    reordering the global (segment_id, doc_id) tie-break on equal scores.
    Restricting policies to contiguous runs keeps rank identity exact."""
    ids = sorted(ids)
    best: list[int] = []
    cur: list[int] = []
    for s in ids:
        if cur and s == cur[-1] + 1:
            cur.append(s)
        else:
            cur = [s]
        if len(cur) > len(best):
            best = list(cur)
    return best if len(best) >= 2 else []


def pick_small_segments(reader: IndexReader, max_docs: int) -> list[int]:
    """``consolidate_docs_live``-style policy: merge segments whose live doc
    count is below ``max_docs`` (index_utils.hpp:96-111 analogue); restricted
    to the longest contiguous id run (tie-break identity, see above)."""
    rows = reader.norms().select("segment_id", "docs_count").collect()
    out = sorted(int(r["segment_id"]) for r in rows if int(r["docs_count"]) < max_docs)
    return _longest_contiguous(out)


def pick_count(reader: IndexReader, target_segments: int) -> list[int]:
    """``consolidate_count``-style policy: merge the first segments until
    ≤ ``target_segments`` remain (index_utils.hpp:84-94 analogue); contiguous
    prefix run so the doc-id remap preserves global tie order."""
    ids = sorted(
        int(r["segment_id"])
        for r in reader.norms().select("segment_id", "docs_count").collect()
    )
    n_merge = len(ids) - target_segments + 1
    if n_merge < 2:
        return []
    return _longest_contiguous(ids[:n_merge])


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
    if merge_ids != list(range(merge_ids[0], merge_ids[-1] + 1)):
        raise ValueError(
            f"consolidate requires a contiguous segment-id run, got {merge_ids}: "
            "merging a gapped subset reorders the global (segment_id, doc_id) "
            "tie-break on equal scores"
        )
    docs_count = dict(seg_rows)
    target = merge_ids[0]
    offsets = {}
    acc = 0
    for s in merge_ids:
        offsets[s] = acc
        acc += docs_count[s]
    b_offsets = spark.sparkContext.broadcast(offsets)
    p_parts = int(meta.get("postings_partitions", 16))

    t_all = time.time()
    builder = IndexBuilder(spark, index_path)

    # ---- postings ----
    postings = reader.postings()
    passthrough = postings.where(~F.col("segment_id").isin(merge_ids))
    to_merge = postings.where(F.col("segment_id").isin(merge_ids))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """Merge one term-hash group of posting rows into the target segment.

        Whole-group batch codec: TWO vbyte decode passes (vbyte streams are
        self-delimiting, so all rows' buffers concatenate) + ONE
        :func:`encode_postings_batch` call — no per-term Python re-encode
        (merge_writer.cpp's remapping iterators collapsed into flat numpy)."""
        cols = (
            "term", "segment_id", "docs_count", "total_freq", "max_freq",
            "doc_ids_enc", "freqs_enc", "pos_enc",
            "block_last_doc", "block_doc_off", "block_freq_off", "block_max_freq",
        )
        if len(pdf) == 0:
            return pd.DataFrame({k: [] for k in cols})
        offs = b_offsets.value
        tgt = min(offs)
        pdf = pdf.sort_values(["term", "segment_id"], kind="stable").reset_index(drop=True)
        n_rows = len(pdf)
        counts = pdf["docs_count"].to_numpy(np.int64)
        n = int(counts.sum())
        # doc ids: delta streams are absolute at each row start → one global
        # decode + per-row cumsum reset + per-row segment offset
        deltas = vbyte_decode(b"".join(pdf["doc_ids_enc"])).astype(np.int64)
        row_starts = np.zeros(n_rows, np.int64)
        np.cumsum(counts[:-1], out=row_starts[1:])
        row_of = np.repeat(np.arange(n_rows), counts)
        csum = np.cumsum(deltas)
        carry = csum[row_starts] - deltas[row_starts]
        seg_off = pdf["segment_id"].map(offs).to_numpy(np.int64)
        ids = csum - carry[row_of] + seg_off[row_of]
        freqs = vbyte_decode(b"".join(pdf["freqs_enc"])).astype(np.int64)
        # term boundaries in element space
        codes, uniq_terms = pd.factorize(pdf["term"])
        first_row = np.flatnonzero(np.diff(codes, prepend=-1))
        tb = np.append(row_starts[first_row], n)
        enc = encode_postings_batch(ids, freqs, tb, positions=None)
        # per-doc position deltas are remap-invariant → byte concat per term
        row_bounds = np.append(first_row, n_rows)
        pos_vals = [v if v is not None else b"" for v in pdf["pos_enc"]]
        enc["pos_enc"] = [
            b"".join(pos_vals[row_bounds[t] : row_bounds[t + 1]])
            for t in range(uniq_terms.size)
        ]
        out = {"term": list(uniq_terms), "segment_id": np.full(uniq_terms.size, tgt, np.int32)}
        out.update(enc)
        return pd.DataFrame(out)[list(cols)]

    n_groups = max(8, p_parts)
    merged = (
        to_merge.withColumn("mgrp", F.abs(F.hash("term")) % n_groups)
        .groupBy("mgrp")
        .applyInPandas(lambda pdf: merge_group(pdf.drop(columns=["mgrp"])), POSTINGS_SCHEMA)
    )
    postings_path = os.path.join(gen_dir, "postings")
    (
        passthrough.unionByName(merged)
        .repartitionByRange(p_parts, "term", "segment_id")
        .sortWithinPartitions("term", "segment_id")
        .write.mode("overwrite")
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
