"""Sharded DuckDB oracles for ``chunk_dedup_clean`` and
``exact_substring_overlap`` at tiers where the one-shot registry oracle
exceeds a single command budget (the x1000 / 5M-doc tier) — the same
technique proven on doc_novelty (tools/doc_novelty_shard_oracle.py): the
global decision in each query is digest-local and ASSOCIATIVE across
doc_id shards, so exact partials merge exactly, in integers end-to-end.

* ``chunk`` (chunk_dedup_clean): the keep rule is "globally first
  occurrence per 32-word-chunk digest", first = min (doc_id, chunk_id)
  lexicographically.  Packed as ``doc_id * 1024 + chunk_id`` (a single
  BIGINT whose order equals the tuple order while chunk_id < 1024 —
  asserted per shard), the global owner is ``MIN over shards of the
  shard-local MIN`` — associative.  Reassembly is doc-local, so each
  shard rebuilds its own documents against the merged owner table.
  Output certifies the verbatim reassembled text via md5 computed
  INDEPENDENTLY inside each engine (the driver never ships full text).
* ``sub`` (exact_substring_overlap): the census rule is "16-token window
  digest repeats anywhere in the corpus" — global count per digest =
  SUM of shard-local counts, associative.  Coverage union and the
  per-doc fraction are doc-local.  ``dup_frac`` is one int/int division
  of identical integers on both sides — tie-free at any corpus size.
* ``winnow`` (winnowing_shared_pairs): the winnowing SELECTION is
  doc-local, so doc_id shards compute exact per-document fingerprint
  postings independently (``partial``); the global df-cap + posting
  self-join runs once over the sparse selected postings (``compare``) —
  the one-shot oracle's grams x window exploded join spilled >75 GB at
  the x1000 tier, the sharded winnow bounds it at 1/OF.
* ``iwinnow`` (incremental_winnowing_dedup): reuses the SAME ``wpost``
  partials (selection is identical; only the tail differs) — index =
  held slice with the df-cap computed over index postings only, batch =
  the %5==0 slice, one join + census in ``compare``.
* ``touch`` (purchase_touch_attribution): the attribution decision is
  USER-LOCAL (every purchase joins only its own user's touches), so
  sharding both join sides by ``user_id % OF`` partitions the output
  exactly — no merge stage at all; ``compare`` unions the per-shard
  oracle outputs against the engine run.  This is the gate the direct
  |P| x |T| inequality join cannot afford at the densified x100 tier.

Stages (run shards as separate commands; WORKDIR persists the handoff)::

    python tools/dedup_shard_oracle.py {chunk|sub} partial  WORKDIR S/OF [SF_DIR]
    python tools/dedup_shard_oracle.py {chunk|sub} merge    WORKDIR [SF_DIR]
    python tools/dedup_shard_oracle.py {chunk|sub} finalize WORKDIR S/OF [SF_DIR]
    python tools/dedup_shard_oracle.py {chunk|sub} compare  WORKDIR [SF_DIR]

``merge`` refuses mixed shard layouts in WORKDIR (stale partials from a
different OF must be removed, not blended); ``compare`` runs the ENGINE
query on the same SF_DIR and hash-compares order-insensitively with the
sweep's exact canonicalization.
"""
from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF = "/root/repo/.scale_stress/x1000"

#: chunk_id packing multiplier — doc_id * MULT + chunk_id must preserve
#: (doc_id, chunk_id) order, so every shard asserts max(chunk_id) < MULT.
#: 1024 chunks x 32 words = 32k-word docs; max doc_id ~1e12 keeps the
#: packed key < 1.1e15, ~8000x inside int64.
CHUNK_MULT = 1024


def _docs_glob(sf_dir: str) -> str:
    p = f"{sf_dir}/documents.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _duck(workdir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET temp_directory='{workdir}/duck_tmp'")
    con.execute("SET preserve_insertion_order=false")
    return con


def _parse_shard(spec: str) -> tuple[int, int]:
    shard, of = (int(p) for p in spec.split("/"))
    if not 0 <= shard < of:
        raise SystemExit(f"bad shard spec {spec!r} (want SHARD/OF, 0<=SHARD<OF)")
    return shard, of


def _pinned_layout(workdir: str, prefix: str) -> int:
    """The single OF of the ``{prefix}_S_of_OF.parquet`` partials in
    WORKDIR; refuses mixed layouts and incomplete shard coverage."""
    seen: dict[int, set[int]] = {}
    for p in glob.glob(os.path.join(workdir, f"{prefix}_*_of_*.parquet")):
        m = re.match(rf"{prefix}_(\d+)_of_(\d+)\.parquet$", os.path.basename(p))
        if m:
            seen.setdefault(int(m.group(2)), set()).add(int(m.group(1)))
    if not seen:
        raise SystemExit(f"no {prefix}_*_of_*.parquet partials in {workdir}")
    if len(seen) > 1:
        raise SystemExit(
            f"mixed shard layouts for {prefix} in {workdir}: OF={sorted(seen)}"
            " — remove the stale layout before merging"
        )
    (of, shards), = seen.items()
    missing = sorted(set(range(of)) - shards)
    if missing:
        raise SystemExit(f"{prefix} layout {of}-way missing shards {missing}")
    return of


# --------------------------------------------------------------------------
# chunk_dedup_clean
# --------------------------------------------------------------------------

_CHUNKS_CTE = """
    w AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM read_parquet('{docs}')
        WHERE doc_id % {of} = {shard}
    ),
    st AS (
        SELECT doc_id, w,
               unnest(generate_series(0, CAST(len(w) - 1 AS BIGINT),
                                      CAST(32 AS BIGINT))) AS s
        FROM w
    ),
    ch AS (
        SELECT doc_id, s // 32 AS chunk_id,
               array_to_string(w[s + 1 : s + 32], ' ') AS chunk_text,
               md5(array_to_string(w[s + 1 : s + 32], ' ')) AS digest
        FROM st
    )
"""


def _chunk_partial(workdir: str, spec: str, sf_dir: str) -> None:
    shard, of = _parse_shard(spec)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        "CREATE TEMP TABLE ch AS WITH "
        + _CHUNKS_CTE.format(docs=_docs_glob(sf_dir), of=of, shard=shard)
        + " SELECT doc_id, chunk_id, digest FROM ch"
    )
    max_chunk = con.execute("SELECT COALESCE(MAX(chunk_id), 0) FROM ch").fetchone()[0]
    assert max_chunk < CHUNK_MULT, (
        f"chunk_id {max_chunk} >= {CHUNK_MULT}: packed owner key would not "
        f"preserve (doc_id, chunk_id) order — raise CHUNK_MULT"
    )
    con.execute(
        f"""COPY (SELECT digest,
                         MIN(doc_id * {CHUNK_MULT} + chunk_id) AS owner_key
                  FROM ch GROUP BY 1)
            TO '{workdir}/cfirsts_{shard}_of_{of}.parquet'"""
    )
    n = con.execute("SELECT COUNT(*) FROM ch").fetchone()[0]
    print(json.dumps({
        "query": "chunk", "stage": "partial", "shard": shard, "of": of,
        "chunk_rows": n, "max_chunk_id": int(max_chunk),
        "wall_sec": round(time.time() - t0, 1),
    }))


def _chunk_merge(workdir: str, sf_dir: str) -> None:
    of = _pinned_layout(workdir, "cfirsts")
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        f"""COPY (SELECT digest, MIN(owner_key) AS owner_key
                  FROM read_parquet('{workdir}/cfirsts_*_of_{of}.parquet')
                  GROUP BY 1)
            TO '{workdir}/cowners.parquet'"""
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/cowners.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "chunk", "stage": "merge", "of": of, "distinct_digests": n,
        "wall_sec": round(time.time() - t0, 1),
    }))


def _chunk_finalize(workdir: str, spec: str, sf_dir: str) -> None:
    shard, of = _parse_shard(spec)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        "COPY (WITH "
        + _CHUNKS_CTE.format(docs=_docs_glob(sf_dir), of=of, shard=shard)
        + f""",
        k AS (
            SELECT ch.doc_id, ch.chunk_id, ch.chunk_text,
                   (ch.doc_id * {CHUNK_MULT} + ch.chunk_id = o.owner_key)
                       AS keep
            FROM ch JOIN read_parquet('{workdir}/cowners.parquet') o
                 USING (digest)
        )
        SELECT doc_id,
               md5(COALESCE(string_agg(chunk_text, ' ' ORDER BY chunk_id)
                                FILTER (WHERE keep), '')) AS cleaned_md5,
               CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_chunks_kept,
               CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT)
                   AS n_chunks_removed
        FROM k GROUP BY doc_id
        ) TO '{workdir}/cout_{shard}_of_{of}.parquet'"""
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/cout_{shard}_of_{of}.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "chunk", "stage": "finalize", "shard": shard, "of": of,
        "doc_rows": n, "wall_sec": round(time.time() - t0, 1),
    }))


def _chunk_compare(workdir: str, sf_dir: str) -> None:
    of = _pinned_layout(workdir, "cout")
    from pyspark.sql import functions as F

    from tsdisagg_spark.queries import QUERIES

    spark = _compare_session("chunk-shard-compare")
    t0 = time.time()
    sdf = QUERIES["chunk_dedup_clean"](spark, sf_dir).select(
        "doc_id",
        F.md5("cleaned_text").alias("cleaned_md5"),
        "n_chunks_kept",
        "n_chunks_removed",
    )
    _hash_compare(sdf, f"{workdir}/cout_*_of_{of}.parquet", t0, "chunk")


# --------------------------------------------------------------------------
# exact_substring_overlap
# --------------------------------------------------------------------------

_WINS_CTE = """
    words AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM read_parquet('{docs}')
        WHERE doc_id % {of} = {shard}
    ),
    wins AS (
        SELECT doc_id, i - 1 AS pos0,
               md5(array_to_string(w[i:i+15], ' ')) AS dig
        FROM words,
        LATERAL (SELECT unnest(generate_series(1, len(w) - 15)) AS i) t
    )
"""


def _sub_partial(workdir: str, spec: str, sf_dir: str) -> None:
    shard, of = _parse_shard(spec)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        "COPY (WITH "
        + _WINS_CTE.format(docs=_docs_glob(sf_dir), of=of, shard=shard)
        + f""" SELECT dig, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM wins GROUP BY 1)
            TO '{workdir}/scounts_{shard}_of_{of}.parquet'"""
    )
    n = con.execute(
        f"SELECT COALESCE(SUM(cnt), 0) FROM "
        f"read_parquet('{workdir}/scounts_{shard}_of_{of}.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "sub", "stage": "partial", "shard": shard, "of": of,
        "window_rows": int(n), "wall_sec": round(time.time() - t0, 1),
    }))


def _sub_merge(workdir: str, sf_dir: str) -> None:
    of = _pinned_layout(workdir, "scounts")
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        f"""COPY (SELECT dig
                  FROM read_parquet('{workdir}/scounts_*_of_{of}.parquet')
                  GROUP BY dig HAVING SUM(cnt) >= 2)
            TO '{workdir}/srep.parquet'"""
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/srep.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "sub", "stage": "merge", "of": of, "repeated_digests": n,
        "wall_sec": round(time.time() - t0, 1),
    }))


def _sub_finalize(workdir: str, spec: str, sf_dir: str) -> None:
    shard, of = _parse_shard(spec)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        "COPY (WITH "
        + _WINS_CTE.format(docs=_docs_glob(sf_dir), of=of, shard=shard)
        + f""",
        cov AS (
            SELECT DISTINCT doc_id, p
            FROM wins JOIN read_parquet('{workdir}/srep.parquet') USING (dig),
            LATERAL (SELECT unnest(generate_series(pos0, pos0 + 15)) AS p) q
        ),
        agg AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM cov GROUP BY doc_id)
        SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
               CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               ROUND(COALESCE(a.dup_tokens, 0) * 1.0 / len(w.w), 6) AS dup_frac
        FROM words w LEFT JOIN agg a USING (doc_id)
        ) TO '{workdir}/sout_{shard}_of_{of}.parquet'"""
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/sout_{shard}_of_{of}.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "sub", "stage": "finalize", "shard": shard, "of": of,
        "doc_rows": n, "wall_sec": round(time.time() - t0, 1),
    }))


def _sub_compare(workdir: str, sf_dir: str) -> None:
    of = _pinned_layout(workdir, "sout")
    from tsdisagg_spark.queries import QUERIES

    spark = _compare_session("sub-shard-compare")
    t0 = time.time()
    sdf = QUERIES["exact_substring_overlap"](spark, sf_dir)
    _hash_compare(sdf, f"{workdir}/sout_*_of_{of}.parquet", t0, "sub")


# --------------------------------------------------------------------------
# purchase_touch_attribution (user-sharded, no merge: the decision is
# user-local, so each shard's oracle output is already final)
# --------------------------------------------------------------------------


def _events_glob(sf_dir: str) -> str:
    p = f"{sf_dir}/events.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


_TOUCH_SQL = """
    WITH ev AS (
        SELECT event_id, user_id, ts, event_type
        FROM read_parquet('{events}')
        WHERE user_id % {of} = {shard}
          AND event_type IN ('click', 'view', 'purchase')
    ),
    p AS (
        SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
    ),
    tch AS (
        SELECT user_id, ts, event_id, event_type
        FROM ev WHERE event_type IN ('click', 'view')
    )
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(COUNT(tch.event_id) AS BIGINT) AS n_touches_7d,
           struct_extract(
               min({{'k': epoch_us(tch.ts), 'i': tch.event_id,
                     'e': tch.event_type}}), 'e') AS first_touch,
           struct_extract(
               max({{'k': epoch_us(tch.ts), 'i': tch.event_id,
                     'e': tch.event_type}}), 'e') AS last_touch
    FROM p
    LEFT JOIN tch ON p.user_id = tch.user_id
        AND tch.ts < p.ts AND tch.ts >= p.ts - INTERVAL 7 DAY
    GROUP BY 1, 2, 3
"""


def _touch_partial(workdir: str, spec: str, sf_dir: str) -> None:
    shard, of = _parse_shard(spec)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        "COPY ("
        + _TOUCH_SQL.format(events=_events_glob(sf_dir), of=of, shard=shard)
        + f") TO '{workdir}/tout_{shard}_of_{of}.parquet'"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/tout_{shard}_of_{of}.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "touch", "stage": "partial", "shard": shard, "of": of,
        "purchase_rows": n, "wall_sec": round(time.time() - t0, 1),
    }))


def _touch_compare(workdir: str, sf_dir: str) -> None:
    of = _pinned_layout(workdir, "tout")
    from tsdisagg_spark.queries import QUERIES

    spark = _compare_session("touch-shard-compare")
    t0 = time.time()
    sdf = QUERIES["purchase_touch_attribution"](spark, sf_dir)
    _hash_compare(sdf, f"{workdir}/tout_*_of_{of}.parquet", t0, "touch")


# --------------------------------------------------------------------------
# winnowing_shared_pairs (doc-sharded selection, global pair census: the
# winnowing SELECTION is doc-local, so doc_id % OF shards compute exact
# per-document fingerprint postings independently; only the final
# df-cap + posting self-join is global, and it runs over the ~2/(w+1)-
# sparse SELECTED postings, never the gram stream.  This exists because
# the one-shot registry oracle's window-min join materializes the full
# grams x window exploded join at the x1000 tier — DuckDB spilled >75 GB
# of temp and died; the sharded winnow bounds the explode at 1/OF.)
# --------------------------------------------------------------------------


_WINNOW_POST_SQL = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM read_parquet('{docs}')
        WHERE doc_id % {of} = {shard}
    ),
    g AS (
        SELECT doc_id, len(w) - 3 AS n_g, w
        FROM toks WHERE len(w) >= 4
    ),
    pos AS (
        SELECT doc_id, i AS j,
               ('0x' || substr(
                   md5(array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS hj
        FROM g, LATERAL (SELECT unnest(generate_series(1, n_g)) AS i) t
    ),
    wins AS (
        SELECT doc_id, unnest(generate_series(1, greatest(n_g - 4, 1))) AS i
        FROM g
    ),
    wpos AS (
        SELECT w.doc_id, w.i, p.j, p.hj,
               MIN(p.hj) OVER (PARTITION BY w.doc_id, w.i) AS wmin
        FROM wins w
        JOIN pos p ON p.doc_id = w.doc_id AND p.j BETWEEN w.i AND w.i + 4
    ),
    sel AS (
        SELECT doc_id, i, MAX(j) AS sel_j
        FROM wpos WHERE hj = wmin GROUP BY 1, 2
    )
    SELECT DISTINCT s.doc_id, p.hj
    FROM sel s JOIN pos p ON p.doc_id = s.doc_id AND p.j = s.sel_j
"""


def _winnow_partial(workdir: str, spec: str, sf_dir: str) -> None:
    shard, of = _parse_shard(spec)
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        "COPY ("
        + _WINNOW_POST_SQL.format(docs=_docs_glob(sf_dir), of=of, shard=shard)
        + f") TO '{workdir}/wpost_{shard}_of_{of}.parquet'"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{workdir}/wpost_{shard}_of_{of}.parquet')"
    ).fetchone()[0]
    print(json.dumps({
        "query": "winnow", "stage": "partial", "shard": shard, "of": of,
        "posting_rows": n, "wall_sec": round(time.time() - t0, 1),
    }))


def _iwinnow_compare(workdir: str, sf_dir: str) -> None:
    """Gate ``incremental_winnowing_dedup`` from the SAME ``wpost``
    partials the pair gate uses (the per-doc selection is identical;
    only the tail differs): the index side is the held slice (doc_id %
    5 != 0) with the df-cap computed over the INDEX postings only, the
    batch side the % 5 == 0 slice, joined and counted exactly as the
    registry oracle."""
    of = _pinned_layout(workdir, "wpost")
    con = _duck(workdir)
    t0 = time.time()
    con.execute(
        f"""COPY (
        WITH idx AS (
            SELECT doc_id, hj FROM (
                SELECT doc_id, hj, COUNT(*) OVER (PARTITION BY hj) AS dfc
                FROM read_parquet('{workdir}/wpost_*_of_{of}.parquet')
                WHERE doc_id % 5 <> 0
            ) WHERE dfc <= 50
        ),
        bat AS (
            SELECT doc_id, hj
            FROM read_parquet('{workdir}/wpost_*_of_{of}.parquet')
            WHERE doc_id % 5 = 0
        )
        SELECT b.doc_id AS id_batch, i.doc_id AS id_index,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM bat b JOIN idx i ON b.hj = i.hj
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3
        ) TO '{workdir}/iwout.parquet'"""
    )
    print(json.dumps({
        "query": "iwinnow", "stage": "census",
        "wall_sec": round(time.time() - t0, 1),
    }))
    from tsdisagg_spark.queries import QUERIES

    spark = _compare_session("iwinnow-shard-compare")
    t0 = time.time()
    sdf = QUERIES["incremental_winnowing_dedup"](spark, sf_dir)
    _hash_compare(sdf, f"{workdir}/iwout.parquet", t0, "iwinnow")


def _winnow_compare(workdir: str, sf_dir: str) -> None:
    of = _pinned_layout(workdir, "wpost")
    con = _duck(workdir)
    t0 = time.time()
    # the GLOBAL stages, bit-identical to the registry oracle's tail: the
    # df-cap window over the unioned postings, then the pair census
    con.execute(
        f"""COPY (
        WITH capped AS (
            SELECT doc_id, hj FROM (
                SELECT doc_id, hj, COUNT(*) OVER (PARTITION BY hj) AS dfc
                FROM read_parquet('{workdir}/wpost_*_of_{of}.parquet')
            ) WHERE dfc <= 50
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM capped a JOIN capped b ON a.hj = b.hj AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3
        ) TO '{workdir}/wout.parquet'"""
    )
    print(json.dumps({
        "query": "winnow", "stage": "census",
        "wall_sec": round(time.time() - t0, 1),
    }))
    from tsdisagg_spark.queries import QUERIES

    spark = _compare_session("winnow-shard-compare")
    t0 = time.time()
    sdf = QUERIES["winnowing_shared_pairs"](spark, sf_dir)
    _hash_compare(sdf, f"{workdir}/wout.parquet", t0, "winnow")


# --------------------------------------------------------------------------
# shared compare plumbing
# --------------------------------------------------------------------------

def _compare_session(app_name: str):
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=app_name,
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _hash_compare(sdf, oracle_glob: str, t0: float, tag: str) -> None:
    import duckdb

    from oracle_sweep import canon_rows

    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    engine_wall = time.time() - t0

    res = duckdb.sql(f"SELECT * FROM read_parquet('{oracle_glob}')")
    dcols = list(res.columns)
    drows = res.fetchall()

    a = canon_rows(scols, srows)
    b = canon_rows(dcols, drows)
    ha = hashlib.sha256("\n".join(a).encode()).hexdigest()
    hb = hashlib.sha256("\n".join(b).encode()).hexdigest()
    verdict = "MATCH" if ha == hb else "VALUE_MISMATCH"
    print(json.dumps({
        "query": tag, "stage": "compare", "verdict": verdict,
        "spark_rows": len(srows), "oracle_rows": len(drows),
        "engine_wall_sec": round(engine_wall, 1),
        "spark_hash": ha[:16], "oracle_hash": hb[:16],
    }))
    if verdict != "MATCH":
        sb, sa = set(b), set(a)
        print("spark-only:", [x for x in a if x not in sb][:3])
        print("oracle-only:", [x for x in b if x not in sa][:3])
        raise SystemExit(1)


_STAGES = {
    ("chunk", "partial"): _chunk_partial,
    ("chunk", "merge"): _chunk_merge,
    ("chunk", "finalize"): _chunk_finalize,
    ("chunk", "compare"): _chunk_compare,
    ("sub", "partial"): _sub_partial,
    ("sub", "merge"): _sub_merge,
    ("sub", "finalize"): _sub_finalize,
    ("sub", "compare"): _sub_compare,
    ("touch", "partial"): _touch_partial,
    ("touch", "compare"): _touch_compare,
    ("winnow", "partial"): _winnow_partial,
    ("winnow", "compare"): _winnow_compare,
    ("iwinnow", "compare"): _iwinnow_compare,
}


def main() -> None:
    argv = sys.argv[1:]
    if len(argv) < 3 or (argv[0], argv[1]) not in _STAGES:
        raise SystemExit(__doc__)
    query, stage, workdir = argv[0], argv[1], argv[2]
    os.makedirs(workdir, exist_ok=True)
    fn = _STAGES[(query, stage)]
    if stage in {"partial", "finalize"}:
        fn(workdir, argv[3], argv[4] if len(argv) > 4 else DEFAULT_SF)
    else:
        fn(workdir, argv[3] if len(argv) > 3 else DEFAULT_SF)


if __name__ == "__main__":
    main()
