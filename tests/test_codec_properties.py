"""Property-based codec contracts (hypothesis).

The seeded randomized tests in test_codec.py sample a fixed distribution;
these state the codec's contracts over *adversarial* inputs with shrinking:

* vbyte round-trip holds for every uint64 value, including the 2^(7k)-1 /
  2^(7k) encoding-length boundaries and 2^64-1 (the reference's bytes_io
  vwrite/vread contract, utils/bytes_utils.hpp).
* postings encode→decode is the identity for any strictly-increasing doc-id
  stream with arbitrary gap sizes (multi-byte deltas), any tf distribution,
  and any per-doc ascending position stream (formats_10.cpp block format).
* selective block decode (the WAND skip path) equals the matching slice of
  the full decode for EVERY subset of blocks, not just hand-picked ones.
* the whole-segment batch encoder is byte-identical to per-term encoding
  (the invariant the build path relies on, codec.py:encode_postings_batch).
* the payload value-stream codec round-trips arbitrary non-negative
  per-occurrence values (no-delta absolute varints, formats_10.cpp `.pay`).

All cases are driver-local numpy — no SparkSession, so the whole file runs
in seconds.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from iresearch_spark.index.codec import (
    BLOCK_SIZE,
    decode_doc_ids,
    decode_freqs,
    decode_positions,
    encode_postings,
    encode_postings_batch,
    encode_value_stream_arrow,
    vbyte_decode,
    vbyte_encode,
)

# every vbyte length boundary: 2^(7k)-1 encodes in k bytes, 2^(7k) in k+1
_BOUNDARIES = [0, 1] + [v for k in range(1, 10) for v in ((1 << (7 * k)) - 1, 1 << (7 * k))]
_BOUNDARIES += [2**63, 2**64 - 1]

uint64s = st.one_of(
    st.sampled_from(_BOUNDARIES),
    st.integers(min_value=0, max_value=2**64 - 1),
)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(st.lists(uint64s, max_size=400))
def test_vbyte_roundtrip_any_uint64(values):
    a = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(vbyte_decode(vbyte_encode(a)), a)


@st.composite
def posting_lists(draw, max_docs=300):
    """(doc_ids, freqs, positions): strictly-increasing ids with gaps that
    exercise 1..5-byte deltas; ascending per-doc positions likewise."""
    n = draw(st.integers(min_value=1, max_value=max_docs))
    gaps = draw(
        st.lists(st.integers(1, 2**34), min_size=n, max_size=n)
    )
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64))
    freqs = np.array(draw(st.lists(st.integers(1, 6), min_size=n, max_size=n)), dtype=np.int64)
    total = int(freqs.sum())
    pos_deltas = draw(st.lists(st.integers(1, 2**20), min_size=total, max_size=total))
    pd = np.array(pos_deltas, dtype=np.int64)
    # per-doc cumsum: global cumsum corrected at doc starts
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(freqs[:-1], out=starts[1:])
    csum = np.cumsum(pd)
    carry = np.repeat(csum[starts] - pd[starts], freqs)
    positions = csum - carry
    return doc_ids, freqs, positions


@settings(max_examples=60, deadline=None, derandomize=True)
@given(posting_lists())
def test_postings_roundtrip_property(pl):
    doc_ids, freqs, positions = pl
    enc = encode_postings(doc_ids, freqs, positions)
    np.testing.assert_array_equal(
        decode_doc_ids(enc.doc_ids_enc, enc.block_doc_off, enc.block_last_doc), doc_ids
    )
    np.testing.assert_array_equal(decode_freqs(enc.freqs_enc, enc.block_freq_off), freqs)
    np.testing.assert_array_equal(decode_positions(enc.pos_enc, freqs), positions)
    # block metadata is exactly the blockwise summary of the input
    nblocks = (doc_ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert enc.block_last_doc.size == nblocks
    for i in range(nblocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, doc_ids.size)
        assert enc.block_last_doc[i] == doc_ids[hi - 1]
        assert enc.block_max_freq[i] == freqs[lo:hi].max()


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    st.integers(min_value=1, max_value=900),
    st.integers(0, 2**32 - 1),
    st.data(),
)
def test_block_subset_decode_equals_full_slice(n, seed, data):
    # bulk arrays are numpy-seeded (drawing 900 gaps int-by-int risks the
    # hypothesis example-size budget); n and the block subset still shrink
    rng = np.random.default_rng(seed)
    doc_ids = np.cumsum(rng.integers(1, 2**34, size=n)).astype(np.int64)
    freqs = rng.integers(1, 6, size=n).astype(np.int64)
    enc = encode_postings(doc_ids, freqs)
    nblocks = enc.block_last_doc.size
    subset = data.draw(
        st.lists(st.integers(0, nblocks - 1), min_size=1, max_size=nblocks, unique=True)
    )
    blocks = np.array(sorted(subset), dtype=np.int64)
    rows = np.concatenate(
        [np.arange(b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, doc_ids.size)) for b in blocks]
    )
    got = decode_doc_ids(enc.doc_ids_enc, enc.block_doc_off, enc.block_last_doc, blocks)
    np.testing.assert_array_equal(got, doc_ids[rows])
    np.testing.assert_array_equal(
        decode_freqs(enc.freqs_enc, enc.block_freq_off, blocks), freqs[rows]
    )


@st.composite
def multi_term_postings(draw):
    """Concatenated per-term posting lists + term_bounds, as the segment
    flush sees them (term-major order).

    Shrinkable shapes stay small (hypothesis example-size budget: drawing
    8×150-doc lists int-by-int routinely overran it); multi-block coverage
    comes from one numpy-seeded long term appended to every example."""
    T = draw(st.integers(min_value=1, max_value=3))
    parts = [draw(posting_lists(max_docs=40)) for _ in range(T)]
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    nlong = draw(st.integers(BLOCK_SIZE + 1, 3 * BLOCK_SIZE + 7))
    long_ids = np.cumsum(rng.integers(1, 2**34, size=nlong)).astype(np.int64)
    long_tfs = rng.integers(1, 6, size=nlong).astype(np.int64)
    pdel = rng.integers(1, 2**20, size=int(long_tfs.sum())).astype(np.int64)
    starts = np.zeros(nlong, dtype=np.int64)
    np.cumsum(long_tfs[:-1], out=starts[1:])
    csum = np.cumsum(pdel)
    parts.append((long_ids, long_tfs, csum - np.repeat(csum[starts] - pdel[starts], long_tfs)))
    T += 1
    bounds = np.zeros(T + 1, dtype=np.int64)
    for t, (ids, _, _) in enumerate(parts):
        bounds[t + 1] = bounds[t] + ids.size
    doc_ids = np.concatenate([p[0] for p in parts])
    freqs = np.concatenate([p[1] for p in parts])
    positions = np.concatenate([p[2] for p in parts])
    return parts, doc_ids, freqs, positions, bounds


@settings(max_examples=30, deadline=None, derandomize=True)
@given(multi_term_postings())
def test_batch_encode_byte_identical_to_per_term(mt):
    parts, doc_ids, freqs, positions, bounds = mt
    batch = encode_postings_batch(doc_ids, freqs, bounds, positions)
    for t, (ids, tfs, pos) in enumerate(parts):
        single = encode_postings(ids, tfs, pos)
        assert batch["doc_ids_enc"][t] == single.doc_ids_enc
        assert batch["freqs_enc"][t] == single.freqs_enc
        assert batch["pos_enc"][t] == single.pos_enc
        assert batch["docs_count"][t] == single.docs_count
        assert batch["total_freq"][t] == single.total_freq
        assert batch["max_freq"][t] == single.max_freq
        assert batch["block_last_doc"][t] == single.block_last_doc.tolist()
        assert batch["block_doc_off"][t] == single.block_doc_off.tolist()
        assert batch["block_freq_off"][t] == single.block_freq_off.tolist()
        assert batch["block_max_freq"][t] == single.block_max_freq.tolist()


@st.composite
def value_streams(draw):
    """(values, freqs, term_bounds) for the payload codec — small shapes so
    the drawn value list stays within hypothesis' example-size budget."""
    T = draw(st.integers(min_value=1, max_value=4))
    counts = [draw(st.integers(1, 12)) for _ in range(T)]
    bounds = np.zeros(T + 1, dtype=np.int64)
    for t, c in enumerate(counts):
        bounds[t + 1] = bounds[t] + c
    n = int(bounds[-1])
    freqs = np.array(draw(st.lists(st.integers(1, 4), min_size=n, max_size=n)), dtype=np.int64)
    total = int(freqs.sum())
    vals = np.array(
        draw(st.lists(st.integers(0, 2**40), min_size=total, max_size=total)),
        dtype=np.int64,
    )
    return vals, freqs, bounds


@settings(max_examples=60, deadline=None, derandomize=True)
@given(value_streams())
def test_value_stream_roundtrip_property(vs):
    vals, freqs, bounds = vs
    arr = encode_value_stream_arrow(vals, freqs, bounds)
    ppre = np.zeros(freqs.size + 1, dtype=np.int64)
    np.cumsum(freqs, out=ppre[1:])
    tok_bounds = ppre[bounds]
    for t in range(bounds.size - 1):
        got = vbyte_decode(arr[t].as_py()).astype(np.int64)
        np.testing.assert_array_equal(got, vals[tok_bounds[t] : tok_bounds[t + 1]])
