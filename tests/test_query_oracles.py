"""Driver-parity harness: every queries() entry must match its
oracle_sql() DuckDB result on sf0.01 — row count, column names, and
order-insensitive value multiset (mirroring CORRECTNESS_r{N}.json).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _canon_duck(t):
    """Canonical dtype token for a DuckDB type string."""
    t = str(t)
    if t.endswith("[]"):
        return f"list<{_canon_duck(t[:-2])}>"
    return {
        "BIGINT": "i64", "HUGEINT": "i128", "INTEGER": "i32",
        "SMALLINT": "i16", "TINYINT": "i8", "DOUBLE": "f64",
        "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
        "BLOB": "bin",
    }.get(t.upper(), t.upper())


def _canon_spark(t):
    """Canonical dtype token for a Spark simpleString type."""
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{_canon_spark(t[6:-1])}>"
    return {
        "bigint": "i64", "int": "i32", "smallint": "i16",
        "tinyint": "i8", "double": "f64", "float": "f32",
        "string": "str", "boolean": "bool", "binary": "bin",
    }.get(t, t.upper())  # match _canon_duck's fallback case so e.g.
    # decimal(18,3) == DECIMAL(18,3) compares equal across engines


def normalize(df):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(None if math.isnan(v) else round(v, 9))
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                out.append(None)
            else:
                out.append(v)
        rows.append(tuple(out))
    return cols, sorted(rows, key=repr)


QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, con):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got_df = q(spark, SF_DIR)
    # dtype parity BEFORE value parity: the driver's value hash is
    # type-sensitive (r04's quality_calibration flap was DuckDB
    # promoting an integer-division chain to HUGEINT while values
    # matched bit-for-bit; pandas normalization hides that here).
    rel = con.sql(sql)
    duck_types = {
        c: _canon_duck(t) for c, t in zip(rel.columns, rel.types)
    }
    spark_types = {
        f.name: _canon_spark(f.dataType.simpleString())
        for f in got_df.schema.fields
    }
    assert spark_types == duck_types, (
        f"{name}: dtype mismatch spark={spark_types} duck={duck_types}"
    )
    got = got_df.toPandas()
    want = con.execute(sql).df()
    gc, gr = normalize(got)
    wc, wr = normalize(want)
    assert gc == wc, f"{name}: columns {gc} != {wc}"
    assert len(gr) == len(wr), f"{name}: rows {len(gr)} != {len(wr)}"
    mism = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"got={gr[mism[0]]} want={wr[mism[0]]}"
    )


def test_oracle_keys_cover_queries():
    assert set(entry_mod.oracle_sql().keys()) == set(entry_mod.queries().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "part_id", "offset", "kind", "text", "media_ref",
    ]
