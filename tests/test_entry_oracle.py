"""Simulates the driver's correctness gate: run every ``queries()`` entry on
Spark at sf0.01 and its ``oracle_sql()`` in DuckDB, compare row count, schema
(column names) and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ducked():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders"]:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, round floats."""
    cols_sorted = sorted(cols)
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        vals = []
        for c in cols_sorted:
            v = d[c]
            if isinstance(v, float):
                v = 0.0 if (not math.isnan(v) and abs(v) < 5e-10) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ALL_QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, ducked, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check (approximate ops)
        return
    res = ducked.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: schema mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    a, b = canon(srows, scols), canon(orows, ocols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score"]
