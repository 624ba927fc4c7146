"""Randomized index-lifecycle differential test: interleaved append /
delete / consolidate sequences must keep search results identical to the
scalar oracle at every step, under the engine's pinned stats semantics —
BM25 stats are computed over ALL indexed docs (stale) while deletes only
MASK matches, until a consolidation purges the deleted docs from the stats
base (test_deletes.py semantics; index_writer.cpp document_mask +
merge_writer purge). Hand-written lifecycle tests cover each transition
once; this covers their compositions under three deterministic seeds.
"""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt
from iresearch_spark.index.consolidate import consolidate
from iresearch_spark.index.deletes import delete_docs
from tests.oracle import ScalarIndex
from tests.test_build_and_query import WORDS

# one dense + one sparse posting keeps the check sharp at half the jobs
PROBE_TERMS = ["spark", "crawl"]


def _gen_docs(seed: int, n: int = 160) -> dict[str, str]:
    rng = np.random.default_rng(seed)
    zipf_p = 1.0 / np.arange(1, len(WORDS) + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    return {
        f"doc{i:05d}": " ".join(
            rng.choice(WORDS, size=int(rng.integers(5, 40)), p=zipf_p)
        )
        for i in range(n)
    }


def _df(spark, docs: dict[str, str], keys):
    return spark.createDataFrame(
        [(k, docs[k]) for k in sorted(keys)], "doc_key string, text string"
    )


def _check(spark, path, docs, stats_base: set, deleted: set, step: str):
    """Engine full hits vs oracle: stats over ``stats_base`` docs, matches
    masked to the non-deleted subset."""
    searcher = Searcher(IndexReader(spark, path))
    oracle = ScalarIndex({k: docs[k] for k in sorted(stats_base)})
    for term in PROBE_TERMS:
        got = {
            r["doc_key"]: r["score"]
            for r in searcher.search(flt.Term(term), k=10**6).collect()
        }
        exp = {
            k: s for k, s in oracle.term_query(term, k=10**6) if k not in deleted
        }
        assert got.keys() == exp.keys(), (step, term, len(got), len(exp))
        for k, v in got.items():
            assert math.isclose(v, exp[k], rel_tol=1e-9), (step, term, k)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_lifecycle_matches_oracle(spark, tmp_path_factory, seed):
    docs = _gen_docs(seed)
    keys = sorted(docs)
    initial, batch1, batch2 = keys[:80], keys[80:120], keys[120:160]
    path = str(tmp_path_factory.mktemp(f"life{seed}"))

    builder = IndexBuilder(spark, path, analyzer="simple", num_segments=2)
    builder.build(_df(spark, docs, initial), key_col="doc_key", text_col="text")
    stats_base = set(initial)  # docs contributing to BM25 stats
    deleted: set = set()

    rng = np.random.default_rng(seed * 7 + 1)
    pending = [("append", batch1), ("append", batch2), ("delete",), ("delete",), ("consolidate",)]
    rng.shuffle(pending)
    _check(spark, path, docs, stats_base, deleted, "build")

    for i, op in enumerate(pending):
        step = f"{i}:{op[0]}"
        if op[0] == "append":
            IndexBuilder(spark, path, analyzer="simple", num_segments=2).append(
                _df(spark, docs, op[1])
            )
            stats_base |= set(op[1])
        elif op[0] == "delete":
            live = sorted(stats_base - deleted)
            victims = list(rng.choice(live, size=min(12, len(live)), replace=False))
            delete_docs(IndexReader(spark, path), victims)
            deleted |= set(victims)
        else:  # consolidate: purge -> deleted docs leave the stats base
            consolidate(IndexReader(spark, path))
            stats_base -= deleted
        _check(spark, path, docs, stats_base, deleted, step)
