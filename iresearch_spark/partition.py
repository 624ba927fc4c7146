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


def segment_routing_keys(ids: list[int]) -> tuple[dict[int, int], int] | None:
    """Per-segment ROUTING keys for a zero-empty-task placement: exactly
    ``n = len(ids)`` partitions with segment ``ids[j]`` (sorted order) alone
    in partition ``j``.

    :func:`collision_free_partition_count` keeps the raw ``segment_id``
    column as the shuffle key, which forces the modulus ABOVE n to dodge
    murmur3 collisions (32 dense ids need 250 partitions — 218 empty tasks
    scheduled per kernel stage, pure per-query overhead; the 8n fallback can
    blow the stage up further).  Routing instead assigns each segment a small
    substitute integer ``r`` with ``pmod(murmur3(r), n) == dense_rank(id)``
    — found by scanning r upward (coupon-collector, ~n·ln n probes,
    driver-side, no Spark job) — so ``repartition(n, route_col)`` places one
    segment per task with NO empty tasks and NO inflated modulus.  The
    caller shuffles AND groups by the route column (an injective image of
    segment_id), which keeps Catalyst's clustered-distribution proof intact
    (grouping by segment_id over a route-partitioned child would re-exchange).

    Returns ``(id -> routing key, n)``, or None if the scan cap is hit
    (pathological; caller falls back to the collision-free modulus).
    """
    sids = sorted({int(i) for i in ids})
    n = len(sids)
    if n == 0:
        return {}, 1
    need = set(range(n))
    found: dict[int, int] = {}
    cap = 64 * n + 4096
    r = 0
    while need and r < cap:
        b = spark_murmur3_int32(r) % n
        if b < 0:
            b += n
        if b in need:
            found[b] = r
            need.discard(b)
        r += 1
    if need:
        return None
    return {sid: found[j] for j, sid in enumerate(sids)}, n
