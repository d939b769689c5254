"""Full driver-style correctness sweep: run every registry query against
its DuckDB oracle (row count + sorted-column schema + order-insensitive
value comparison) at a chosen scale factor.

Usage::

    python tools/oracle_sweep.py [sf_dir]     # default /root/testdata/sf0.01
    python tools/oracle_sweep.py --only simhash [sf_dir]   # substring filter

This replicates the external driver's t2 gate more aggressively than
tests/test_queries.py (which runs at sf0.001): a second data scale catches
threshold- and coverage-dependent divergence.  Exit code 1 on any problem.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# Driver-faithful dtype classes.  The external driver fetches the DuckDB
# side with ``fetchnumpy()``, which renders HUGEINT/UHUGEINT/DECIMAL as
# float64 — so a bare SUM(BIGINT) oracle (HUGEINT in DuckDB) hash-compares
# as 3.0 against Spark's int64 3 and FAILS even though values are equal
# (CORRECTNESS_r03: wav/ppm/ppm_resize quanta).  We simulate that layer:
# classify each column as integer-like / float-like on both engines and
# flag any i-vs-f divergence before the value compare.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOATISH = {"FLOAT", "DOUBLE", "HUGEINT", "UHUGEINT"}


def _duck_class(type_str: str) -> str:
    t = type_str.upper()
    if t in _DUCK_INT:
        return "i"
    if t in _DUCK_FLOATISH or t.startswith("DECIMAL"):
        return "f"
    return "o"


def _spark_class(dt) -> str:
    name = dt.simpleString()
    if name in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if name in ("float", "double") or name.startswith("decimal"):
        return "f"
    return "o"


def dtype_mismatches(sdf, duck_res) -> list[str]:
    """Columns whose numpy-canonical dtype class diverges between Spark and
    the DuckDB oracle (int-vs-float under the driver's fetchnumpy)."""
    scls = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
    bad = []
    for col, typ in zip(duck_res.columns, duck_res.types):
        dc, sc = _duck_class(str(typ)), scls.get(col, "?")
        if {dc, sc} == {"i", "f"}:
            bad.append(f"{col}: spark={sc} duck={typ}")
    return bad


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        cells = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                cells.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                cells.append(v.isoformat())
            else:
                cells.append(str(v))
        out.append("\x1f".join(cells))
    return sorted(out)


def main() -> int:
    import duckdb

    argv = sys.argv[1:]
    only = None
    names = None
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1]
        del argv[i : i + 2]
    if "--names" in argv:
        # exact-name allowlist (comma-separated) — the 100x stress gate
        # runs a curated linear-oracle subset, not a substring family
        i = argv.index("--names")
        names = {s.strip() for s in argv[i + 1].split(",") if s.strip()}
        del argv[i : i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    # the engine's session factory, not a bare builder: a raw local session
    # runs on Spark's 1 GB default heap, which survives the driver-gate SFs
    # but throws executor OOMs when this sweep is pointed at a scale-stress
    # directory (the same failure class session.py sizes against)
    from tsdisagg_spark.spark.session import get_spark

    spark = get_spark(
        app_name="oracle-sweep",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    import os

    con = duckdb.connect()
    for tn in TABLES:
        # testdata tables are single files; scale-stress dirs are
        # Spark-written DIRECTORIES named <table>.parquet — glob those
        path = f"{sf}/{tn}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {tn} AS SELECT * FROM read_parquet('{path}')"
        )

    from tsdisagg_spark.cacheutil import persistent_rdd_ids, release_all

    problems = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        if names is not None and name not in names:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            # managed cache lifetime: the pair-family queries persist
            # posting lists / signatures with caller-managed lifetime and
            # the iterative graph queries leave final checkpoint blocks —
            # release after each query's materialization so a 133-query
            # session holds O(1) storage, not a sum over every query,
            # and the per-query timing below never reads a predecessor's
            # cache.  (Safe here: srows is already collected.)
            release_all(spark)
            el = round(time.time() - t0, 1)
            if name not in oracles:
                print(f"{name}\tROWS_ONLY\t{len(srows)}\t{el}s")
                continue
            res = con.sql(oracles[name])
            bad_types = dtype_mismatches(sdf, res)
            dcols, drows = list(res.columns), res.fetchall()
            scols = list(sdf.columns)
            if sorted(scols) != sorted(dcols):
                print(f"{name}\tSCHEMA_MISMATCH\t{sorted(scols)} vs {sorted(dcols)}")
                problems += 1
                continue
            if bad_types:
                print(f"{name}\tDTYPE_MISMATCH\t{bad_types}")
                problems += 1
                continue
            a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
            if a == b:
                print(f"{name}\tMATCH\t{len(srows)}\t{el}s")
            else:
                problems += 1
                sb, sa = set(b), set(a)
                print(f"{name}\tVALUE_MISMATCH\t{len(a)} vs {len(b)}")
                print("  spark-only:", [x for x in a if x not in sb][:3])
                print("  duck-only:", [x for x in b if x not in sa][:3])
        except Exception:
            problems += 1
            print(f"{name}\tERROR\t{traceback.format_exc().splitlines()[-1][:200]}")

    # zero-leak gate: after per-query release_all the session must hold no
    # persisted RDDs at all — a nonzero residue means some operator grew a
    # cache path release_all cannot see (storage regression)
    leaked = persistent_rdd_ids(spark)
    if leaked:
        problems += 1
        print(f"LEAKED_PERSISTENT_RDDS\t{leaked}")
    print(f"== {len(qs)} queries, {problems} problems")
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
