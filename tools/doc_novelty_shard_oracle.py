"""Sharded DuckDB oracle for ``doc_novelty`` at tiers where the one-shot
lateral unnest exceeds the command budget (the x1000 / 5M-doc tier blows
a ~400M-row unnest).

The novelty rule is a GLOBAL min-by-corpus-order per 3-gram — associative
across document shards: ``owner(g) = min_shard(min_in_shard(g))``.  So
the oracle splits exactly, in exact integers end-to-end:

1. ``partial WORKDIR SHARD/OF [SF_DIR]`` — DuckDB over the docs with
   ``doc_id % OF == SHARD`` only: per-doc distinct-gram counts
   (``sizes_S.parquet``; each doc lives wholly in one shard) and
   per-gram shard-local min owner keyed on ``md5(gram)``
   (``firsts_S.parquet``).
2. ``merge WORKDIR [SF_DIR]`` — global owner = MIN over the shard
   partials per gram digest; ``n_novel`` = count of grams by global
   owner; left-join onto the full doc list -> ``oracle_result.parquet``.
3. ``compare WORKDIR [SF_DIR]`` — run the ENGINE's doc_novelty on the
   same SF_DIR and compare order-insensitively with the sweep's exact
   canonicalization (row count + per-row string canon + sha256).

Every aggregate is integer; ``novelty`` is one int/int division of
identical integers on both sides — bit-identical, tie-free at any
corpus size (same argument as the registry oracle's docstring).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF = "/root/repo/.scale_stress/x1000"


def _docs_glob(sf_dir: str) -> str:
    """DuckDB-readable path for the documents table: plain file at the
    testdata SFs, Spark part-file directory at the scaled tiers."""
    p = f"{sf_dir}/documents.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _duck(workdir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET temp_directory='{workdir}/duck_tmp'")
    con.execute("SET preserve_insertion_order=false")
    return con


def _partial(workdir: str, shard_spec: str, sf_dir: str) -> None:
    shard, of = (int(p) for p in shard_spec.split("/"))
    if not 0 <= shard < of:
        raise SystemExit(f"bad shard spec {shard_spec!r}")
    docs = _docs_glob(sf_dir)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        f"""
        CREATE TEMP TABLE sh AS
        WITH docs AS (
            SELECT doc_id, text
            FROM read_parquet('{docs}')
            WHERE doc_id % {of} = {shard}
        ),
        words AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
            FROM docs
        )
        SELECT DISTINCT doc_id,
               md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g
        FROM words, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
        ) t
        """
    )
    con.execute(
        f"""COPY (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
                  FROM sh GROUP BY 1)
            TO '{workdir}/sizes_{shard}_of_{of}.parquet'"""
    )
    con.execute(
        f"""COPY (SELECT g, MIN(doc_id) AS owner FROM sh GROUP BY 1)
            TO '{workdir}/firsts_{shard}_of_{of}.parquet'"""
    )
    n = con.execute("SELECT COUNT(*) FROM sh").fetchone()[0]
    print(json.dumps({
        "stage": "partial", "shard": shard, "of": of,
        "doc_gram_rows": n, "wall_sec": round(time.time() - t0, 1),
    }))


def _merge(workdir: str, sf_dir: str) -> None:
    docs = _docs_glob(sf_dir)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        f"""
        COPY (
            WITH firsts AS (
                SELECT g, MIN(owner) AS owner
                FROM read_parquet('{workdir}/firsts_*_of_*.parquet')
                GROUP BY 1
            ),
            novel AS (
                SELECT owner AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
                FROM firsts GROUP BY 1
            ),
            sizes AS (
                SELECT doc_id, n_grams
                FROM read_parquet('{workdir}/sizes_*_of_*.parquet')
            )
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
                   CASE WHEN COALESCE(s.n_grams, 0) > 0
                        THEN CAST(COALESCE(nv.n_novel, 0) AS DOUBLE) / s.n_grams
                   END AS novelty
            FROM (SELECT doc_id
                  FROM read_parquet('{docs}')) d
            LEFT JOIN sizes s USING (doc_id)
            LEFT JOIN novel nv ON d.doc_id = nv.doc_id
        ) TO '{workdir}/oracle_result.parquet'
        """
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/oracle_result.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "stage": "merge", "oracle_rows": n,
        "wall_sec": round(time.time() - t0, 1),
    }))


def _compare(workdir: str, sf_dir: str) -> None:
    import duckdb

    from oracle_sweep import canon_rows
    from tsdisagg_spark.queries import QUERIES
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="doc-novelty-shard-compare",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    sdf = QUERIES["doc_novelty"](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    engine_wall = time.time() - t0

    res = duckdb.sql(
        f"SELECT * FROM read_parquet('{workdir}/oracle_result.parquet')"
    )
    dcols = list(res.columns)
    drows = res.fetchall()

    a = canon_rows(scols, srows)
    b = canon_rows(dcols, drows)
    ha = hashlib.sha256("\n".join(a).encode()).hexdigest()
    hb = hashlib.sha256("\n".join(b).encode()).hexdigest()
    verdict = "MATCH" if ha == hb else "VALUE_MISMATCH"
    print(json.dumps({
        "stage": "compare", "verdict": verdict,
        "spark_rows": len(srows), "oracle_rows": len(drows),
        "engine_wall_sec": round(engine_wall, 1),
        "spark_hash": ha[:16], "oracle_hash": hb[:16],
    }))
    if verdict != "MATCH":
        sb, sa = set(b), set(a)
        print("spark-only:", [x for x in a if x not in sb][:3])
        print("oracle-only:", [x for x in b if x not in sa][:3])
        raise SystemExit(1)


def main() -> None:
    argv = sys.argv[1:]
    if not argv or argv[0] not in {"partial", "merge", "compare"}:
        raise SystemExit(__doc__)
    stage, workdir = argv[0], argv[1]
    os.makedirs(workdir, exist_ok=True)
    if stage == "partial":
        _partial(workdir, argv[2], argv[3] if len(argv) > 3 else DEFAULT_SF)
    elif stage == "merge":
        _merge(workdir, argv[2] if len(argv) > 2 else DEFAULT_SF)
    else:
        _compare(workdir, argv[2] if len(argv) > 2 else DEFAULT_SF)


if __name__ == "__main__":
    main()
