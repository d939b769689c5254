"""Local mini-driver: every registered query with an oracle must match the
DuckDB result on row count, column names, and an order-insensitive value
hash — replicating the external driver's t2 correctness gate at sf0.001.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("TSD_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def canon(value):
    """Canonical string form per cell, tolerant to engine representation
    differences (float formatting, date vs datetime midnight)."""
    if value is None:
        return "<null>"
    if isinstance(value, float):
        if math.isnan(value):
            return "<nan>"
        return f"{value:.6f}"
    if isinstance(value, bool):
        return str(bool(value))
    # datetimes/dates -> ISO seconds; date stays date-like
    if hasattr(value, "isoformat"):
        s = value.isoformat()
        return s[:-3] if s.endswith("000") and "." in s else s
    return str(value)


def table_signature(columns, rows):
    cols = sorted(columns)
    order = [columns.index(c) for c in cols]
    lines = sorted(
        "\x1f".join(canon(row[i]) for i in order) for row in rows
    )
    return cols, len(lines), hash(tuple(lines))


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, ddb):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = ddb.sql(entry_mod.oracle_sql()[name])
    duck_cols = list(res.columns)
    duck_rows = res.fetchall()

    s_cols, s_n, s_hash = table_signature(spark_cols, spark_rows)
    d_cols, d_n, d_hash = table_signature(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert s_n == d_n, f"{name}: row count {s_n} vs {d_n}"
    if s_hash != d_hash:
        s_set = set(
            "\x1f".join(canon(row[spark_cols.index(c)]) for c in s_cols)
            for row in spark_rows
        )
        d_set = set(
            "\x1f".join(canon(row[duck_cols.index(c)]) for c in d_cols)
            for row in duck_rows
        )
        only_s = list(s_set - d_set)[:5]
        only_d = list(d_set - s_set)[:5]
        pytest.fail(
            f"{name}: value hash mismatch\n spark-only: {only_s}\n duck-only: {only_d}"
        )


NO_ORACLE = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_without_oracle_runs(name, spark):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_result_types_numpy_safe(name, ddb):
    """No oracle may produce a HUGEINT/UHUGEINT/DECIMAL column.

    The external driver fetches the DuckDB side with ``fetchnumpy()``,
    which renders those types as float64 while Spark emits int64/double —
    values compare equal but the hash canonicalization diverges
    (CORRECTNESS_r03: wav/ppm/ppm_resize quanta failed exactly this way
    from bare ``SUM(BIGINT)`` → HUGEINT).  Every integer aggregate must be
    CAST(... AS BIGINT) and every decimal-producing expression cast to
    DOUBLE.  DuckDB resolves result types without executing, but we LIMIT 0
    anyway to keep this a metadata-speed test."""
    sql = entry_mod.oracle_sql()[name]
    res = ddb.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    bad = [
        f"{col}: {typ}"
        for col, typ in zip(res.columns, res.types)
        if str(typ).upper() in ("HUGEINT", "UHUGEINT")
        or str(typ).upper().startswith("DECIMAL")
    ]
    assert not bad, (
        f"{name}: oracle columns would be float64 under the driver's "
        f"numpy fetch while Spark emits exact types — add explicit casts: {bad}"
    )


def test_readme_counts_match_registry():
    """README's query/oracle counts are DERIVED claims — this pins them to
    the registry so adding a query without updating the doc fails CI
    (round-2 review found the doc 20 queries stale)."""
    import re

    readme = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    n_q, n_o = len(entry_mod.queries()), len(entry_mod.oracle_sql())
    n_rows_only = n_q - n_o
    assert f"{n_q} queries, {n_o} DuckDB oracles" in readme, (
        f"README registry line is stale: registry has {n_q} queries / "
        f"{n_o} oracles"
    )
    assert f"`queries()` ({n_q} operators" in readme
    assert f"`oracle_sql()` ({n_o} DuckDB equivalents" in readme
    assert f"the {n_rows_only} rows-only entries" in readme, (
        f"README rows-only count is stale: registry has {n_rows_only}"
    )
