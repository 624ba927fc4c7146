"""Text-analysis + deduplication operators for large-scale training-data
pipelines — first-class engine components alongside the fulltext index.

All operators are declarative DataFrame transforms (JVM-side built-ins, whole
stage codegen) unless noted; Python only appears in vectorized Arrow kernels.
Tokenization matches the index analyzer ``simple`` so every operator shares the
oracle ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``.

Scale notes per operator are in the docstrings — each was designed for the
100 TB case (shuffle keys, broadcast sides, skew behavior), then validated on
the sandbox testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _widen(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition an input that arrives grossly under-parallelized (fewer
    than half the session's cores — e.g. one small parquet file scanning as a
    single split) so the heavy per-row map work (shingling, md5 hashing)
    uses every core instead of one.

    At production scale this is a NO-OP: a 100 TB scan already has thousands
    of input splits, so the gate (one plan inspection, no Spark job) never
    fires and no shuffle is added. When it does fire, partitioning by the
    aggregation key lets Catalyst reuse the exchange for every downstream
    ``groupBy`` whose keys contain ``key_cols`` (hash partitioning on a
    subset satisfies the clustering requirement), so the net shuffle count
    is unchanged — the shuffle just moves BEFORE the row-expanding compute,
    where the data is smallest."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plan shapes without RDD conversion
        return df
    if cur * 2 >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def tokens_col(text_col="text"):
    """array<string> of lowercase alnum tokens (JVM-side, no UDF)."""
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != "")


def norm_text_col(text_col="text"):
    """Whitespace-normalized lowercase token join — dedup canonical form."""
    return F.array_join(tokens_col(text_col), " ")


# ------------------------------------------------------------------ analysis


# BPE-ish subtoken pattern: letter chunks capped at 4 chars (the ~4-chars-
# per-subword heuristic of byte-pair vocabularies), single digits (BPE
# tokenizers split numbers), and each punctuation mark — a deterministic,
# dialect-portable regex (same semantics in Java regex and RE2/DuckDB)
# standing in for a real learned BPE vocab, which needs model files.
BPE_ISH = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"


def token_stats(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Token counting: whitespace-word total + unique, plus a BPE-ish
    subtoken count (``BPE_ISH`` chunks — the LLM-pipeline "how many tokens
    is this corpus" estimator). One narrow map, no shuffle."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), F.lit(0))
        ).alias("n_subtokens"),
    )


def quality_score(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Heuristic quality signals: mean token length, alnum ratio, token count.

    Mirrors common webtext quality filters (length / punctuation / repetition);
    all closed-form column expressions → pushdown-friendly, no shuffle."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    alnum_chars = F.length(F.array_join(toks, ""))
    total_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(alnum_chars / F.greatest(n_tok, F.lit(1)), 4).cast("double").alias("mean_token_len"),
        F.round(alnum_chars / F.greatest(total_chars, F.lit(1)), 4).cast("double").alias("alnum_ratio"),
        (n_tok >= 5).cast("int").alias("len_ok"),
    )


def lang_id(df: DataFrame, id_col="doc_id", text_col="text", threshold=0.05) -> DataFrame:
    """N-gram/stopword-heuristic language ID: ratio of English function words.

    A real pipeline would plug a fastText model into the same shape (the
    reference's ``classification`` analyzer, classification_stream.cpp); the
    heuristic keeps it model-free and oracle-checkable."""
    en_stop = ["the", "a", "of", "and", "to", "in", "is", "it"]
    toks = tokens_col(text_col)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(en_stop)))
    ratio = n_stop / F.greatest(F.size(toks), F.lit(1))
    return df.select(
        F.col(id_col),
        F.round(ratio, 4).cast("double").alias("stopword_ratio"),
        F.when(ratio >= threshold, "en").otherwise("unk").alias("lang_guess"),
    )


def fingerprint(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Document fingerprint: md5 of the normalized token stream.

    Content-defined identity that survives whitespace/punct/case noise; the
    join key for exact dedup. Narrow map only."""
    return df.select(F.col(id_col), F.md5(norm_text_col(text_col)).alias("fp"))


def winnow_fingerprints(
    df: DataFrame, id_col="doc_id", text_col="text", k: int = 5, window: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprints by WINNOWING (Schleimer et al.,
    SIGMOD 2003 — the MOSS scheme): hash every k-token gram, slide a
    ``window``-wide window over the hash sequence, keep each window's
    minimum, emit the distinct selected hashes as ``(id, fp)`` rows.

    Two docs sharing any sufficiently long token run share fingerprints
    (winnowing guarantees detection of matches ≥ window+k-1 tokens), so a
    groupBy/self-join on ``fp`` finds copied passages that md5-exact
    fingerprinting misses. Simplification vs the paper: ties keep the min
    VALUE (not the rightmost position) — fingerprint SETS are identical.

    Scale shape: one narrow map per doc (gram hashing + window minima are
    JVM higher-order functions over arrays, no UDF, no shuffle); the
    downstream join on ``fp`` is the standard high-cardinality hash shuffle.
    Hashes are :func:`_hash32_col` (md5-derived) so the whole plan replays
    in the DuckDB oracle."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    gi = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(gi, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    hashes = F.transform(grams, lambda g: _hash32_col(g))
    wi = F.sequence(F.lit(0), F.greatest(F.size(hashes) - window, F.lit(0)))
    mins = F.transform(wi, lambda j: F.array_min(F.slice(hashes, j + 1, window)))
    return _widen(df, id_col).select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


# --------------------------------------------------------------------- dedup


def exact_duplicates(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Exact (normalized) dedup groups: fingerprint → count + keeper id.

    groupBy on a high-cardinality hash → uniform shuffle, no skew. At 100 TB
    this is the cheapest dedup pass and runs first."""
    return (
        fingerprint(df, id_col, text_col)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .where(F.col("dup_count") > 1)
    )


def shingles(df: DataFrame, id_col="doc_id", text_col="text", k: int = 3) -> DataFrame:
    """k-token shingle set per doc (distinct), exploded to (id, shingle)."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return _widen(df, id_col).select(
        F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col="doc_id",
    text_col="text",
    k: int = 3,
    threshold: float = 0.0,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs by k-token-shingle Jaccard.

    Shuffle pattern: self-join on ``shingle`` (a < b to halve), then
    group-count intersections; |A∪B| from per-doc set sizes. Head shingles
    (boilerplate) are the skew risk at scale: ``max_shingle_freq`` drops any
    shingle appearing in more than that many docs BEFORE the self-join — a
    shingle of df f fans out f²/2 pair rows, so one boilerplate header line
    shared by 1M pages would otherwise emit 5·10¹¹ rows from a single key.
    Capped shingles still count toward |A∪B| (set sizes are computed
    pre-cap), so reported jaccard is a LOWER bound for pairs that shared a
    capped shingle — the standard candidate-generation trade; exact scores
    need the MinHash-LSH path (:func:`minhash_lsh_pairs`). Default None
    keeps the exact quadratic semantics (verification-scale only)."""
    sh = shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    if max_shingle_freq is not None:
        # scale path: ONE grouped stage — collect each shingle's (capped)
        # posting into an array, expand within-shingle pairs JVM-side, then
        # count per pair.  Replaces the former [frequent-set aggregate +
        # 2-sided broadcast anti-join + shingle self-join], which evaluated
        # the shingle lineage four times; array size is bounded by
        # max_shingle_freq, so per-row fan-out is capped at freq²/2.  Capped
        # shingles still count toward |A∪B| (sizes computed pre-cap above) —
        # jaccard stays the documented lower bound.
        pairs = (
            sh.groupBy("shingle")
            .agg(F.collect_list(F.col(id_col)).alias("ids"))
            .where((F.size("ids") >= 2) & (F.size("ids") <= max_shingle_freq))
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
                        "struct(least(x, y) as a, greatest(x, y) as b))))"
                    )
                ).alias("p")
            )
            .groupBy("p.a", "p.b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # exact quadratic mode (verification scale only): keep the streaming
        # self-join — a grouped array would put an entire uncapped posting
        # (and its freq²/2 pair structs) into one row/task
        pairs = (
            sh.alias("l")
            .join(sh.alias("r"), "shingle")
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .groupBy(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("set_size").alias("size_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 4
            ).cast("double").alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _hash32_col(c):
    """Deterministic engine-agnostic 32-bit hash: first 8 hex chars of md5.
    Reproducible in DuckDB as ``cast('0x'||substr(md5(x),1,8) as ubigint)``."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


# MinHash parameters (Carter-Wegman (a*x+b) mod p over md5-derived keys).
# p = 2^31-1 keeps a*x < 2^62 → no BIGINT overflow in Spark or the SQL oracle.
MINHASH_PRIME = 2147483647


def minhash_params(num_hashes: int = 16, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a tiny LCG — no RNG at plan time."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (MINHASH_PRIME - 2) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % (MINHASH_PRIME - 1)
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    id_col="doc_id",
    text_col="text",
    k: int = 3,
    num_hashes: int = 16,
    seed: int = 7,
) -> DataFrame:
    """MinHash signature per doc (minhash_token_stream.cpp analogue):
    shingle → 32-bit md5 key → min over (a*x+b) mod p per hash function.

    ZERO-shuffle narrow map (same rewrite as :func:`simhash64`): the shingle
    set, md5 keys, and per-hash minima are all per-row higher-order array
    expressions — a min over a doc's shingles never needed a groupBy, the
    explode + num_hashes min-aggregates shape just mirrored the exploded
    token-stream view. Removing it drops a doc-keyed shuffle of the whole
    shingle stream (the largest intermediate of the dedup plane at 10^12
    docs) and one exchange from every downstream LSH plan. Row semantics
    unchanged: docs shorter than k tokens contribute their full-text join
    (possibly the empty shingle), so every doc keeps a signature."""
    params = minhash_params(num_hashes, seed)
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")))
    xs = F.transform(sh, lambda s: _hash32_col(s) % MINHASH_PRIME)
    mins = [
        F.array_min(
            F.transform(F.col("__xs"), lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_PRIME))
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(params)
    ]
    return _widen(df, id_col).select(F.col(id_col), xs.alias("__xs")).select(F.col(id_col), *mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col="doc_id",
    text_col="text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 7,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: band the signature, join on band hash.

    The scale path for near-dedup: candidate generation is |docs|×bands rows
    joined on banded-signature buckets (uniform by construction) instead of a
    quadratic shingle join. Verify candidates with exact Jaccard downstream.

    ``max_bucket`` is the skew guard for the within-bucket self-join: a band
    bucket of n members fans out n²/2 pair rows, and boilerplate/empty pages
    share IDENTICAL banded signatures — one hot bucket at 100 TB is a
    job-killer. Buckets larger than the cap are dropped from the pair join
    (deterministic: a property of the bucket histogram, not sampling), so the
    candidate set is a LOWER bound — same documented semantics as
    :func:`iresearch_spark.vecops.lsh_bucket_candidates`. Pairs that also
    share a small bucket in ANOTHER band still surface. Default None keeps
    the exact semantics (verification scale only)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes, seed)
    band_cols = [
        F.md5(F.concat_ws("_", F.lit(bi), *[F.col(f"mh{bi * rows + r}") for r in range(rows)])).alias(
            f"band{bi}"
        )
        for bi in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band{bi}") for bi in range(bands)])).alias("bucket"),
    )
    # ONE wide stage instead of a bucket self-join: group each bucket's
    # members into an array (the only shuffle after the signatures), drop
    # oversized buckets by array size (replaces the former count-aggregate +
    # broadcast anti-join sub-plan, which also re-computed the signature
    # lineage), and expand the within-bucket pairs JVM-side with
    # higher-order array functions.  The former plan evaluated the signature
    # pipeline up to three times (left/right join branches + the oversized
    # aggregate); this one evaluates it once.  Per-row fan-out is bounded by
    # max_bucket²/2 (uncapped mode remains verification-scale only).
    size_ok = F.size("ids") >= 2
    if max_bucket is not None:
        size_ok = size_ok & (F.size("ids") <= max_bucket)
    return (
        stacked.groupBy("bucket")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .where(size_ok)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
                    "struct(least(x, y) as a, greatest(x, y) as b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )


_SIMHASH_EXPR = """
aggregate(
  zip_with(
    aggregate(
      transform(__toks, t -> named_struct(
        'hi', cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint),
        'lo', cast(conv(substring(md5(t), 9, 8), 16, 10) as bigint))),
      array_repeat(0L, 64),
      (acc, h) -> zip_with(acc, sequence(0, 63), (a, i) ->
        a + if((shiftright(if(i < 32, h.hi, h.lo), i % 32) & 1) != 0, 1L, -1L))),
    sequence(0, 63),
    (b, i) -> if(b > 0, shiftleft(1L, i), 0L)),
  0L, (a, x) -> a + x)"""


def simhash64(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """64-bit SimHash over token md5 hashes: per bit, sign of the sum of
    (+1/−1) weighted by token frequency (sum of ±tf over distinct tokens ==
    sum of ±1 over occurrences, so no tf pre-aggregation is needed).

    Shape: one narrow per-row projection — a higher-order `aggregate` folds
    the token hash array into a 64-counter accumulator, a second packs the
    sign bits (shiftleft(1L, 63) wraps to the signed-long sign bit, matching
    the oracle's `-2^63` term). ZERO shuffles and a ~64-node plan, vs the
    previous explode → groupBy(doc,tok) → 64-aggregate groupBy(doc): that
    plan cost ~2-3.5 s of Catalyst compile PER CALL and moved two doc-keyed
    shuffles (~0.5 TB of 64-long partials at 10^12 docs). Measured at sf0.01:
    steady-state 2.2-3.9 s → 0.57-0.75 s per call, byte-identical checksums;
    the per-token cost is 64 interpreted lambda ops (HOFs skip codegen) —
    a CPU-linear narrow map, which is the scaling-friendly trade. `_widen`
    keeps the map parallel on under-split inputs (single-file small corpora)
    and is a no-op when the scan already has splits."""
    return (
        _widen(df, id_col)
        .select(F.col(id_col), tokens_col(text_col).alias("__toks"))
        # token-less / null-text docs have no signature (matches the oracle's
        # unnest semantics and the previous explode-based implementation)
        .where(F.size("__toks") > 0)
        .select(F.col(id_col), F.expr(_SIMHASH_EXPR).alias("simhash"))
    )
