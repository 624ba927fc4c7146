"""Collision-free segment→task placement helpers.

Spark's ``repartition(n, col)`` routes rows by ``pmod(murmur3(col), n)``
(HashPartitioning). With n partitions for n distinct segment ids the hash
COLLIDES with high probability (8 ids → a [2,1,1,1,1,1,1] occupancy,
measured), serializing two segments' kernels on one task while other cores
idle — the dominant N→4N scaling loss at high parallelism for both batch
serving and the segment invert job. :func:`spark_murmur3_int32` replicates
Spark's hash of one INT column value exactly (pytest asserts parity with
``F.hash``), so :func:`collision_free_partition_count` can scan partition
counts upward and find one that places every id in its own bucket — with no
sampling job and no extra Spark pass.

Reference analogue: the per-segment execute loop (one thread per segment,
index_writer.cpp flush contexts) — here re-expressed as explicit Spark hash
partitioning with a provably collision-free modulus.
"""

from __future__ import annotations


def spark_murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's ``F.hash()`` / HashPartitioning hash of one INT column value:
    Murmur3_x86_32 hashInt with seed 42."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k1 = x & 0xFFFFFFFF
    k1 = (k1 * c1) & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    k1 = (k1 * c2) & 0xFFFFFFFF
    h1 = seed & 0xFFFFFFFF
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # fmix: total byte length (one int)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 2**32 if h1 >= 2**31 else h1


def collision_free_partition_count(ids: list[int]) -> int:
    """Smallest partition count ≥ len(ids) that hash-places every id in its
    own bucket. Falls back to 4×len(ids) if none is found in [n, 8n]."""
    n_ids = max(1, len(ids))
    hs = [spark_murmur3_int32(i) for i in ids]
    for cand in range(n_ids, 8 * n_ids + 1):
        if len({h % cand for h in hs}) == len(ids):
            return cand
    return 4 * n_ids
