"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the reason each operator looks the way it does):

* **Exact** — one hash aggregation on the dedup key.  At 100 TB group by a
  digest of the payload (``md5``), never the payload itself, so shuffle rows
  stay narrow.
* **Jaccard** — the shingle self-join explodes quadratically inside a
  shingle's posting list, so ubiquitous shingles ("of the", boilerplate)
  are pruned by document frequency *before* the join (``max_doc_freq``).
  This is the standard posting-list-cap trick; it bounds join fan-out at the
  cost of ignoring evidence every document shares anyway.
* **MinHash+LSH** — signatures are k min-aggregations over hashed shingles
  (one shuffle); banding turns near-dup search into an equi-join on
  (band_index, band_hash), which Spark hash-partitions — no pairwise scan.
  Candidates are then *verified* with exact Jaccard restricted to candidate
  ids (semi-join pushdown) so false LSH positives never reach the output.
* **SimHash** — 64 sign-sums per document (columnar aggregates, codegen),
  band-blocked for candidate generation, exact Hamming distance via
  ``bit_count(xor)`` to verify.  Banding exactness pins the band COUNT at
  ``max_hamming + 1``, so code WIDTH is the only lever that keeps bucket
  occupancy bounded as the corpus grows — :func:`simhash_md5_120` /
  :func:`simhash_pairs_wide` provide the 120-bit (20-bit-band) variant a
  10x scale-stress run forced, and the construction extends to 240/480
  bits with more salted md5 words.

Cache lifetime: the pair functions ``persist()`` an intermediate
(signatures / posting lists) that feeds both sides of a self-join, and
return a LAZY DataFrame — so the cached blocks cannot be dropped inside the
function without forcing an extra job.  The cache lifetime is
caller-managed: after materializing the result, call
``tsdisagg_spark.cacheutil.release_all(spark)`` (which also frees the
``localCheckpoint`` blocks ``clearCache()`` cannot see) in long-lived
sessions — the oracle sweep does exactly this per query and asserts a
zero-leak session end; a one-shot job can rely on session teardown.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsdisagg_spark.operators.text import _shingles_sql, shingles


def exact_groups(
    df: DataFrame, id_col: str = "doc_id", key_cols: list[str] | None = None
) -> DataFrame:
    """Exact duplicate groups by ``key_cols`` (default: all non-id columns).

    Returns one row per distinct key: the surviving ``keep_id`` (minimum id,
    deterministic), the group size, and a stable ``group_key`` digest.
    Downstream: ``filter(group_size > 1)`` lists duplicates; joining back on
    ``keep_id`` materializes the deduplicated corpus.
    """
    keys = key_cols or [c for c in df.columns if c != id_col]
    digest = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys]))
    return (
        df.select(F.col(id_col), digest.alias("group_key"))
        .groupBy("group_key")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


#: promoted to operators/_par.py in the round-13 optimization pass (stage
#: profiling found the same 1-task map wall in seven more operator
#: families); re-exported here because this module coined the idiom.
from tsdisagg_spark.operators._par import spread_small_input as _spread  # noqa: E402


def shingle_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Distinct (id, shingle) posting list, optionally pruned of shingles
    that appear in more than ``max_doc_freq`` documents (skew guard for the
    self-join — a boilerplate shingle shared by 1M docs would otherwise
    produce 10^12 join rows in one partition)."""
    postings = _spread(df).select(
        F.col(id_col),
        # the posting key is the shingle's 64-bit hash, not the string: the
        # self-join and window exchange then move 8-byte longs instead of
        # ~40-byte strings, and the window sort compares integers.  A hash
        # collision would merge two shingles' postings (overcounting one
        # intersection by one) — at 2^64 key space that needs ~10^9 distinct
        # shingles per corpus before a single collision is likely.
        F.expr(
            "explode(array_distinct(transform("
            + _shingles_sql(text_col, n)
            + ", s -> xxhash64(s))))"
        ).alias("shingle"),
    )
    if max_doc_freq is not None:
        # document frequency as an unordered window count: ONE exchange
        # hash-partitioned on shingle (vs the groupBy + re-join formulation's
        # two), and the downstream posting self-join on shingle can reuse
        # that partitioning instead of exchanging again
        from pyspark.sql.window import Window

        w = Window.partitionBy("shingle")
        postings = (
            postings.withColumn("df", F.count(F.lit(1)).over(w))
            .filter(F.col("df") <= max_doc_freq)
            .drop("df")
        )
    return postings


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-Jaccard >= threshold:
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.

    Exact (not approximate): intersection sizes come from the posting-list
    self-join, union sizes from per-document shingle counts.  Use
    :func:`minhash_pairs` when the corpus is too large for the full join.
    """
    # persisted: the posting list feeds three consumers (both join sides and
    # the size table); without it Spark re-derives it from raw text each time
    postings = shingle_postings(df, id_col, text_col, n, max_doc_freq).persist()
    sizes = postings.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_shingles").alias("size_a")
    )
    sz_b = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_shingles").alias("size_b")
    )
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        # the pair list is tiny relative to the corpus (near-dup pairs) and
        # is the natural pipeline boundary: persisting it lets a downstream
        # clustering pass — or a later query with the identical plan, via
        # the CacheManager's canonicalized-plan matching — skip the posting
        # self-join entirely.  Caller-managed lifetime (module docstring).
        .persist()
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Directed shingle-CONTAINMENT near-dup pairs:
    ``(id_sub, id_super, containment)`` where ``containment =
    |S(sub) ∩ S(super)| / |S(sub)| >= threshold`` (Broder's containment
    coefficient).  Both directions of a pair are emitted independently —
    A quoted inside a 10x-longer B scores C(A→B) ~ 1 while C(B→A) ~ 0.1.

    Why it exists next to :func:`jaccard_pairs`: symmetric Jaccard
    divides by the UNION, so a short document wholly duplicated inside a
    much longer one (quote expansion, boilerplate wrapping, prompt
    stuffing — the classic training-data contamination shapes) scores
    near |A|/|B| and slips under any usable Jaccard threshold.
    Containment normalizes by the smaller side's size and catches it.

    Scale shape: identical to jaccard_pairs — ONE posting self-join on
    the 8-byte shingle hash (df-capped against boilerplate skew), sizes
    as a reused group-by, and the ratio is integer/integer on values
    both engines hold exactly, so the rounded output is
    oracle-hashable."""
    postings = shingle_postings(
        df, id_col, text_col, n, max_doc_freq
    ).persist()
    sizes = postings.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    a, b = postings.alias("a"), postings.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    both = inter.join(
        sizes.select(
            F.col(id_col).alias("id_a"), F.col("n_shingles").alias("size_a")
        ),
        "id_a",
    ).join(
        sizes.select(
            F.col(id_col).alias("id_b"), F.col("n_shingles").alias("size_b")
        ),
        "id_b",
    )
    # BOTH directions from ONE pass: a union of two projections over
    # `both` would plan the posting self-join TWICE (measured 1.85x
    # jaccard_pairs' wall at the 100x stress corpus); exploding a 2-struct
    # array emits (sub, super) and (super, sub) per intersection row with
    # the join subtree evaluated once
    directed = F.explode(
        F.array(
            F.struct(
                F.col("id_a").alias("id_sub"),
                F.col("id_b").alias("id_super"),
                F.round(F.col("n_common") / F.col("size_a"), 6).alias(
                    "containment"
                ),
            ),
            F.struct(
                F.col("id_b").alias("id_sub"),
                F.col("id_a").alias("id_super"),
                F.round(F.col("n_common") / F.col("size_b"), 6).alias(
                    "containment"
                ),
            ),
        )
    )
    return (
        both.select(directed.alias("p"))
        .select("p.id_sub", "p.id_super", "p.containment")
        .filter(F.col("containment") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: ``(id, sig array<int>)``.

    Each signature slot i is ``min(hash(shingle, seed_i))`` — computed as
    ``num_hashes`` min-aggregations over the exploded posting list, one
    shuffle total.  ``hash`` is Spark's Murmur3 with the slot index mixed in
    as a second column (deterministic across runs and executors).

    Formulation note: a shuffle-free variant exists (``array_min`` over
    ``transform`` of the per-row shingle array) but loses by 2-4x in
    practice — Spark evaluates higher-order-function lambdas interpreted,
    per element, while explode + hash-aggregate stays in whole-stage
    codegen.  Measured, not guessed (see BENCH notes).

    Hash-count note: the shingle string is hashed ONCE (the posting key is
    already the shingle's xxhash64); the ``num_hashes`` slot values derive
    from that 64-bit value by integer mixing (murmur over (long, slot)).
    Hashing the string per slot costs ~num_hashes x string-length byte
    mixing per posting row — measured ~25% of the whole signature stage at
    32 slots.
    """
    postings = shingle_postings(df, id_col, text_col, n)
    # ONE py4j round-trip for the whole num_hashes-slot aggregate: building
    # this as num_hashes separate F.min(F.hash(...)) Column objects costs
    # ~8 driver round-trips per slot (~0.5s per call site at 32 slots on
    # this box), all construction overhead.  `hash(shingle, i)` with an
    # INT literal is the same Murmur3 expression F.hash(col, F.lit(i))
    # builds, so signatures are bit-identical.
    sig = F.expr(
        "array("
        + ", ".join(f"min(hash(shingle, {i}))" for i in range(num_hashes))
        + ")"
    ).alias("sig")
    return postings.groupBy(id_col).agg(sig)


def _band_entries(
    sigs: DataFrame, id_col: str, bands: int, rows: int
) -> DataFrame:
    """Explode a ``(id, sig)`` signature frame into its LSH band keys:
    one ``(id, band, band_hash)`` row per (document, band), where
    ``band_hash`` hashes the band's ``rows`` signature slots.  Shared by
    the all-pairs self-join (:func:`minhash_pairs`) and the persistable
    index/probe pair (:func:`minhash_band_index` / :func:`minhash_probe`)
    so both block identically."""
    # single-expr build (one py4j round-trip; see minhash_signatures):
    # named_struct('band', <int literal>, ...) carries the same INT types
    # and Murmur3 band hashes as the F.struct/F.lit/F.hash formulation
    items = ", ".join(
        "named_struct('band', {b}, 'band_hash', hash({slots}))".format(
            b=bi,
            slots=", ".join(
                f"element_at(sig, {bi * rows + ri + 1})" for ri in range(rows)
            ),
        )
        for bi in range(bands)
    )
    return sigs.select(
        F.col(id_col), F.expr(f"explode(array({items}))").alias("bk")
    ).select(id_col, "bk.band", "bk.band_hash")


def _doc_shingle_sets(
    df: DataFrame, ids: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """``(id, sh array)`` shingle-hash sets for exactly the documents in
    ``ids`` (semi-join pushdown: only candidate documents are re-shingled
    for verification)."""
    return (
        shingle_postings(df.join(ids, id_col, "left_semi"), id_col, text_col, n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + locality-sensitive banding.

    ``num_hashes`` slots split into ``bands`` bands of ``num_hashes/bands``
    rows; documents colliding on any band's hash become candidates (an
    equi-join on (band, band_hash) — fully partitioned, no pairwise scan).
    With ``verify=True`` candidates are checked with exact Jaccard computed
    only over candidate documents, so the output has no false positives.
    """
    rows = num_hashes // bands
    # signatures are tiny (id + num_hashes ints) and feed both sides of the
    # band self-join: persist so the hash-min aggregation runs once
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).persist()
    band_entries = _band_entries(sigs, id_col, bands, rows)

    a, b = band_entries.alias("a"), band_entries.alias("b")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    if not verify:
        return candidates
    candidates = candidates.persist()

    # exact verification WITHOUT re-running the posting self-join: collect
    # each candidate document's shingle set once, then intersect per pair —
    # two narrow joins against a table with one row per candidate document
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select("id_b"))
        .distinct()
    )
    # one row per candidate document (bounded by the candidate set, never
    # the corpus) feeding BOTH pair sides: persist so the semi-join +
    # re-shingle + collect_set subtree runs once, not once per side
    # (measured: two ~7s/32-core stages collapsed to one at sf0.1)
    doc_sets = _doc_shingle_sets(df, cand_ids, id_col, text_col, n).persist()
    a_sets = doc_sets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    b_sets = doc_sets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(a_sets, "id_a")
        .join(b_sets, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Persistable MinHash-LSH band index of a corpus: one ``(id, band,
    band_hash)`` row per (document, band) — the structure a continuously-
    ingested training-data pipeline keeps ON DISK so each new batch is
    deduplicated against the existing corpus WITHOUT re-pairing the
    corpus against itself.

    Determinism contract: signatures use Spark's Murmur3 over the
    shingles' xxhash64 with the slot index as a literal second column, so
    an index written to parquet by one session produces bit-identical
    band keys when probed from any later session (pinned by test) — the
    property that makes the index durable rather than session-scoped.

    Scale shape: building is the :func:`minhash_signatures` aggregation
    plus a ``bands``-way explode — one shuffle over the corpus, done once;
    at 100 TB the index is saved ``bucketBy(N, band, band_hash)`` so a
    probe's equi-join reads the index WITHOUT a shuffle on the index side
    (demonstrated by test: the bucketed plan has strictly fewer
    exchanges than the unbucketed one, identical results)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    return _band_entries(sigs, id_col, bands, rows)


def minhash_probe(
    batch: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: probe a NEW document batch against
    an existing :func:`minhash_band_index`, returning
    ``(batch_id, corpus_id, jaccard)`` for every batch document whose
    exact shingle-Jaccard against an indexed document meets ``threshold``.
    Batch-vs-batch pairs are deliberately NOT emitted — that is a
    :func:`minhash_pairs` run over the batch alone.

    ``index`` must have been built with the same ``n``/``num_hashes``/
    ``bands`` (the band keys are a pure function of those parameters);
    ``corpus`` supplies the indexed documents' text for exact
    verification, semi-joined down to candidates only.

    Scale shape — why this beats re-running the all-pairs dedup per
    ingest: the corpus-sized work is ONE equi-join of the (small) batch's
    band entries against the index on ``(band, band_hash)`` — with the
    index bucketed on the join key this is a shuffle of the BATCH only —
    and verification re-reads corpus text for just the candidate ids
    (semi-join pushdown).  Nothing re-pairs corpus-vs-corpus, so ingest
    cost is O(batch + matches), not O(corpus).
    """
    rows = num_hashes // bands
    batch_entries = _band_entries(
        minhash_signatures(batch, id_col, text_col, n, num_hashes),
        id_col,
        bands,
        rows,
    )
    q, x = batch_entries.alias("q"), index.alias("x")
    candidates = (
        q.join(x, ["band", "band_hash"])
        # a document present on both sides (re-ingest) must not pair with
        # itself; cross-id duplicates are exactly what we're looking for
        .filter(F.col(f"q.{id_col}") != F.col(f"x.{id_col}"))
        .select(
            F.col(f"q.{id_col}").alias("batch_id"),
            F.col(f"x.{id_col}").alias("corpus_id"),
        )
        .distinct()
        .persist()
    )
    b_sets = _doc_shingle_sets(
        batch,
        candidates.select(F.col("batch_id").alias(id_col)).distinct(),
        id_col,
        text_col,
        n,
    ).select(F.col(id_col).alias("batch_id"), F.col("sh").alias("sh_b"))
    c_sets = _doc_shingle_sets(
        corpus,
        candidates.select(F.col("corpus_id").alias(id_col)).distinct(),
        id_col,
        text_col,
        n,
    ).select(F.col(id_col).alias("corpus_id"), F.col("sh").alias("sh_c"))
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    return (
        candidates.join(b_sets, "batch_id")
        .join(c_sets, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("sh_b") + F.size("sh_c") - inter), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash per document: ``(id, simhash long)``.

    Per bit position: sum +1/-1 over the document's word hashes, take the
    sign.  A document's tokens already live in its own row, so the whole
    computation is SHUFFLE-FREE: token hashing stays JVM-side as
    ``transform(words(text), xxhash64)`` (no explode, no groupBy — an
    earlier version exploded to 1 row/token and aggregated 64 conditional
    sums back, paying a full-corpus shuffle plus seconds of janino codegen
    for the 64-wide aggregate), and the 64 sign-sums fold in ONE
    Arrow-vectorized pandas UDF per row batch: ``unpackbits`` on the
    little-endian bytes of the hash array gives the (tokens x 64) bit
    matrix, ``add.reduceat`` sums it per document.  This is the documented
    exception where a Pandas UDF beats built-ins: 64 per-bit aggregates are
    one numpy matrix op, but 64 separate codegen expressions.

    ``token_hash`` picks the per-token hash:

    - ``"xxhash64"`` (default): full 64 bits, fastest, but the hash is
      engine-specific — results are reproducible only inside Spark.
    - ``"md5"``: the top 15 hex chars of md5 as a 60-bit hash.  md5 is
      bit-identical in every engine, so the whole simhash (and therefore
      the pair set) can be recomputed independently e.g. by a SQL oracle.
      15 hex chars keep the value strictly below 2**63 — sign-safe in
      engines without unsigned 64-bit integers.
    """
    from tsdisagg_spark.operators.text import words

    nbits = _simhash_nbits(token_hash)
    if token_hash == "md5":
        h_of = lambda tok: F.conv(  # noqa: E731
            F.substring(F.md5(tok), 1, 15), 16, 10
        ).cast("long")
    else:
        h_of = lambda tok: F.xxhash64(tok)  # noqa: E731 — *args fn can't be a HOF lambda directly

    fold_signs = _fold_signs_udf(nbits)
    hashes = F.transform(words(F.col(text_col)), h_of)
    # null-text docs carry no signature (parity with the explode formulation,
    # where a null token array produced no rows); the filter pushes to the scan
    return (
        _spread(df)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), fold_signs(hashes).alias("simhash"))
    )


def _fold_signs_udf(nbits: int):
    """Arrow-vectorized sign-fold: array<long> of per-token hashes ->
    ``nbits``-bit simhash code (see :func:`simhash64` for why this single
    numpy matrix op beats 60-plus codegen aggregates)."""

    @F.pandas_udf("long")
    def fold_signs(hs: pd.Series) -> pd.Series:
        # null text -> null token array -> None element here; treat as empty
        # (the row is filtered out below, matching the explode formulation
        # where a null array produced no rows and the doc had no signature)
        lens = np.fromiter(
            (0 if a is None else len(a) for a in hs), count=len(hs), dtype=np.int64
        )
        out = np.zeros(len(hs), dtype=np.uint64)
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in hs if a is not None]
            )
            # little-endian byte view: unpackbits column k == bit k of the value
            bits = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            offsets = np.zeros(len(hs), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            # reduceat only over non-empty docs: their offsets are strictly
            # increasing and in-bounds (empty docs would repeat or overrun)
            nz = lens > 0
            ones = np.zeros((len(hs), nbits), dtype=np.int64)
            ones[nz] = np.add.reduceat(bits, offsets[nz], axis=0)[:, :nbits]
            # sign rule: majority of ones, exact tie -> 0 (sum +1/-1 > 0)
            code = (2 * ones.astype(np.int64) > lens[:, None]).astype(np.uint64)
            out = (code << np.arange(nbits, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        return pd.Series(out.view(np.int64))

    # asNondeterministic: the optimizer may otherwise DUPLICATE the UDF
    # around a pushed-down filter on its output — measured: a second
    # ArrowEvalPython below the input-spread exchange, re-folding every
    # document single-task (guide 4.4; the function is in fact
    # deterministic, the marker only forbids re-ordering/duplication)
    return fold_signs.asNondeterministic()


def simhash_md5_120(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """120-bit SimHash as two independent 60-bit md5-derived codes:
    ``(id, sim_lo, sim_hi)`` with ``sim_lo`` folded from md5 hex chars
    1-15 and ``sim_hi`` from chars 17-31 per token.

    Why a WIDE code exists: banding exactness pins the band COUNT to
    ``max_hamming + 1`` (pigeonhole), so with a fixed-width code the only
    way to keep band-bucket occupancy bounded as the corpus grows is to
    widen the bands — i.e. lengthen the code.  60 bits at hamming <= 5
    gives 10-bit bands (1,024 buckets): bucket size grows ~N/1024 and the
    candidate self-join ~N^2/1024 — measured 33x wall time at 10x docs in
    the scale-stress run.  120 bits gives 20-bit bands (1,048,576
    buckets), pushing the quadratic knee out by ~2^10; the construction
    extends to 240/480 bits by taking more salted md5 words when a fleet
    needs it.  Both halves stay md5-derived so an external SQL oracle can
    recompute the codes bit-for-bit.

    Cost shape (VERDICT r08 #2 — this was the headline's slowest query's
    dominant cost at x1000): md5 is computed ONCE per token.  The earlier
    formulation ran ``conv(substring(md5(tok), ...), 16, 10)`` per HALF —
    two full md5 digests, two substrings and two base-16 string parses
    per token, plus two separate ``words()`` split passes — and shipped
    two array<long> columns through Arrow into two sign-fold UDF calls.
    Now one ``transform(words(text), md5)`` pass emits the hex digests,
    ``unhex(array_join(..., ''))`` concatenates and decodes them into ONE
    16-bytes-per-token binary blob per doc (half the Arrow volume of the
    hex string, the same 16 B/token the old dual long-array transfer
    carried — a raw hex-cat column OOM'd Arrow's netty buffers at x100),
    and a single Arrow UDF recovers both 60-bit halves numpy-side (one
    big-endian u64 view — hex chars 1-15 of each digest are exactly
    ``(first 8 bytes as big-endian u64) >> 4``, chars 17-31 the same on
    the second 8 bytes) and folds both sign sums in one
    ``unpackbits``/``reduceat`` pass.  Bit-identical codes (pinned by
    test_simhash_md5_120_matches_python_reference against hashlib), so
    the md5 SQL oracles are untouched."""
    from tsdisagg_spark.operators.text import words

    hexcat = F.unhex(
        F.array_join(
            F.transform(words(F.col(text_col)), lambda t: F.md5(t)), ""
        )
    )
    return (
        _spread(df)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), _fold_md5_pair_udf()(hexcat).alias("_s"))
        .select(
            F.col(id_col),
            F.col("_s.sim_lo").alias("sim_lo"),
            F.col("_s.sim_hi").alias("sim_hi"),
        )
    )


def _fold_md5_pair_udf():
    """Arrow-vectorized double sign-fold: one concatenated raw-md5 binary
    blob per document (16 bytes per token) -> both 60-bit simhash halves
    in a single numpy pass (see :func:`simhash_md5_120` for the layout)."""

    @F.pandas_udf("sim_lo long, sim_hi long")
    def fold_pair(blobs: pd.Series) -> pd.DataFrame:
        n = len(blobs)
        # 16 raw bytes per token; None only for null inputs (filtered
        # upstream), kept as 0 tokens for safety => code (0, 0)
        lens = np.fromiter(
            (0 if b is None else len(b) >> 4 for b in blobs),
            count=n,
            dtype=np.int64,
        )
        lo = np.zeros(n, dtype=np.int64)
        hi = np.zeros(n, dtype=np.int64)
        if lens.sum():
            flat = (
                np.frombuffer(
                    b"".join(b for b in blobs if b is not None),
                    dtype=">u8",
                )
                .astype(np.uint64)
                .reshape(-1)
            )
            # per token: [lo_u64, hi_u64]; 15 hex chars == 8-byte half >> 4
            h = flat >> np.uint64(4)
            # little-endian byte view: unpackbits column k == bit k; cols
            # 0..59 are the lo half's bits, 64..123 the hi half's
            bits = np.unpackbits(
                h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).reshape(-1, 128)
            offsets = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            nz = lens > 0
            ones = np.zeros((n, 128), dtype=np.int64)
            ones[nz] = np.add.reduceat(bits, offsets[nz], axis=0)
            # sign rule: majority of ones, exact tie -> 0 (sum +1/-1 > 0)
            code = (2 * ones > lens[:, None]).astype(np.uint64)
            w = np.arange(60, dtype=np.uint64)[None, :]
            lo = (code[:, :60] << w).sum(axis=1, dtype=np.uint64).view(np.int64)
            hi = (
                (code[:, 64:124] << w).sum(axis=1, dtype=np.uint64).view(np.int64)
            )
        return pd.DataFrame({"sim_lo": lo, "sim_hi": hi})

    # asNondeterministic: the optimizer may otherwise DUPLICATE the UDF
    # around a pushed-down filter on its output — measured: a second
    # ArrowEvalPython below the input-spread exchange, re-folding every
    # document single-task (guide 4.4; the function is in fact
    # deterministic, the marker only forbids re-ordering/duplication)
    return fold_pair.asNondeterministic()


def wide_bands(
    sims: DataFrame, id_col: str, n_bands: int
) -> DataFrame:
    """Explode a ``(id, sim_lo, sim_hi)`` 120-bit code frame into its
    ``n_bands`` equal band keys: one ``(id, sim_lo, sim_hi, band,
    band_bits)`` row per (doc, band), with ``band_bits`` the band's
    ``120 / n_bands``-bit slice of the concatenated (lo, hi) bit string
    (sim_lo = bits 0..59, sim_hi = bits 60..119).  Exposed separately so
    the banding layout — the scale lever of the wide SimHash — is
    directly testable; requires ``2 <= n_bands`` and ``n_bands | 120``
    (enforced here, so direct callers get the same clear error as
    :func:`simhash_pairs_wide` — a 1-band mask is wider than LongType and
    would otherwise surface as an opaque Py4J overflow at runtime)."""
    if n_bands < 2 or 120 % n_bands:
        raise ValueError(
            f"n_bands={n_bands} must divide 120 and be >= 2 (bands wider "
            "than 60 bits overflow the LongType band keys)"
        )
    width = 120 // n_bands
    mask = (1 << width) - 1

    def band_bits(bi: int):
        # band bi covers concatenated bits [bi*width, (bi+1)*width); for
        # layouts whose bands straddle bit 60, stitch the two halves
        start, end = bi * width, (bi + 1) * width
        if end <= 60:
            return F.shiftright(F.col("sim_lo"), start).bitwiseAND(F.lit(mask))
        if start >= 60:
            return F.shiftright(F.col("sim_hi"), start - 60).bitwiseAND(
                F.lit(mask)
            )
        lo_part = F.shiftright(F.col("sim_lo"), start)  # top 60-start bits
        hi_part = F.shiftleft(
            F.col("sim_hi").bitwiseAND(F.lit((1 << (end - 60)) - 1)),
            60 - start,
        )
        return lo_part.bitwiseOR(hi_part).bitwiseAND(F.lit(mask))

    return sims.select(
        F.col(id_col),
        "sim_lo",
        "sim_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        band_bits(bi).alias("band_bits"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "sim_lo", "sim_hi", "bk.band", "bk.band_bits")


def simhash_pairs_wide(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 5,
) -> DataFrame:
    """Near-duplicate pairs at Hamming <= ``max_hamming`` over the 120-bit
    code of :func:`simhash_md5_120`, banded ``max_hamming + 1`` x
    ``120 // (max_hamming + 1)`` bits (pigeonhole-exact, same argument as
    :func:`simhash_pairs`).  Returns ``(id_a, id_b, hamming)`` where
    ``hamming`` is summed over both 60-bit halves.

    ``max_hamming + 1`` must divide 120 AND be >= 2 (2, 3, 4, 5, 6, 8,
    10, ... work): a single 120-bit band (max_hamming=0) cannot be
    expressed — its mask exceeds LongType and the half-stitching shift
    overflows 64 bits — so exact-duplicate detection belongs to
    :func:`exact_dups`' digest group-by, not a 1-band SimHash.  Bands are
    carved from the concatenated (lo, hi) bit string; the default 6 x 20
    layout never straddles the half boundary."""
    n_bands = max_hamming + 1
    if 120 % n_bands or n_bands < 2:
        raise ValueError(
            f"max_hamming+1={n_bands} must divide 120 and be >= 2 (bands "
            "wider than 60 bits overflow the LongType band keys; use "
            "exact_dups for hamming=0)"
        )
    sims = simhash_md5_120(df, id_col, text_col).persist()
    bands = wide_bands(sims, id_col, n_bands)

    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.expr("bit_count(a.sim_lo ^ b.sim_lo)")
                + F.expr("bit_count(a.sim_hi ^ b.sim_hi)")
            )
            .cast("long")
            .alias("hamming"),
        )
        # filter BEFORE distinct: a pair found via k bands appears k times
        # with the SAME hamming, so the order is semantics-free — but the
        # distinct's shuffle shrinks from every candidate row to just the
        # survivors (17M -> ~1M at the x100 stress corpus, ~3x wall on the
        # pair stage)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 5,
) -> DataFrame:
    """Persistable wide-SimHash band index: one ``(id, sim_lo, sim_hi,
    band, band_bits)`` row per (document, band) over the 120-bit md5 code
    of :func:`simhash_md5_120`, banded ``max_hamming + 1`` ways
    (pigeonhole-exact, as :func:`simhash_pairs_wide`).

    Two properties the MinHash index does not have: the index carries the
    FULL code, so a probe verifies Hamming distance from the index alone —
    no corpus re-read at probe time — and the code itself is a per-row
    computation (no shuffle), so the whole probe pipeline is stateless
    and runs unchanged on a Structured Streaming document source.
    md5-derived codes keep the index recomputable bit-for-bit by an
    external SQL engine."""
    return wide_bands(
        simhash_md5_120(df, id_col, text_col), id_col, max_hamming + 1
    )


def simhash_probe(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 5,
    dedupe: bool = True,
) -> DataFrame:
    """Incremental SimHash near-dup detection: probe a NEW document batch
    (or stream) against a :func:`simhash_band_index`, returning
    ``(batch_id, corpus_id, hamming)`` for every cross pair within
    ``max_hamming`` over the 120-bit code.

    EXACT, not approximate: by pigeonhole any batch/corpus pair within
    Hamming ``max_hamming`` agrees on at least one of the
    ``max_hamming + 1`` bands, so the banded candidate join has full
    recall, and verification is ``bit_count(xor)`` over the codes both
    sides already carry — the output equals the brute-force cross scan
    (which is exactly what the SQL oracle computes).  ``index`` must use
    the same ``max_hamming``.  Scale shape: one equi-join of the batch's
    band rows against the (bucketable) index; nothing touches
    corpus-vs-corpus and nothing re-reads corpus text.

    Streaming: everything up to the trailing ``distinct`` is stateless
    (the code fold is a per-row pandas UDF, banding a projection, the
    index join stream-static), and a pair found via k agreeing bands
    appears k times with the SAME hamming — so a streaming caller passes
    ``dedupe=False`` and collapses duplicates per micro-batch (every
    duplicate lands in its document's own micro-batch), exactly the
    ``foreachBatch`` discipline of the MinHash probe."""
    b = wide_bands(
        simhash_md5_120(batch, id_col, text_col), id_col, max_hamming + 1
    )
    q, x = b.alias("q"), index.alias("x")
    out = (
        q.join(x, ["band", "band_bits"])
        .filter(F.col(f"q.{id_col}") != F.col(f"x.{id_col}"))
        .select(
            F.col(f"q.{id_col}").alias("batch_id"),
            F.col(f"x.{id_col}").alias("corpus_id"),
            (
                F.expr("bit_count(q.sim_lo ^ x.sim_lo)")
                + F.expr("bit_count(q.sim_hi ^ x.sim_hi)")
            )
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return out.distinct() if dedupe else out


def _simhash_nbits(token_hash: str) -> int:
    if token_hash == "md5":
        return 60
    if token_hash == "xxhash64":
        return 64
    raise ValueError(f"unknown token_hash {token_hash!r} (use 'xxhash64' or 'md5')")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    token_hash: str = "xxhash64",
    n_bands: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= ``max_hamming``.

    Candidate generation blocks on ``n_bands`` equal bit-bands of the
    simhash.  By pigeonhole, two codes within Hamming distance
    ``n_bands - 1`` must agree exactly on at least one band, so with
    ``n_bands > max_hamming`` (enforced) the banding is EXACT: the output
    equals the brute-force all-pairs result, it just never materializes the
    quadratic join.  Verification is ``bit_count(xor)`` on the candidate
    pairs only.  Returns ``(id_a, id_b, hamming)``.

    Default band layout: 4 x 16 bits for xxhash64 (distance <= 3), 6 x 10
    bits for md5/60-bit (distance <= 5).  Wider bands = fewer, more
    selective buckets — at corpus scale prefer raising ``max_hamming`` only
    as far as the band width you can afford, since bucket occupancy (and
    the candidate join fan-out) grows ~N / 2**band_width.

    The signatures DataFrame is ``persist()``-ed (both self-join sides read
    it) and stays cached after this call returns — caller-managed lifetime;
    see the module docstring.
    """
    nbits = _simhash_nbits(token_hash)
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} must exceed max_hamming={max_hamming} "
            "for the pigeonhole recall guarantee"
        )
    if nbits % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide nbits={nbits}")
    width = nbits // n_bands
    mask = (1 << width) - 1

    # persisted: the banding self-join consumes sims on BOTH sides — without
    # this the whole tokenize+hash+fold pipeline runs twice
    sims = simhash64(df, id_col, text_col, token_hash=token_hash).persist()
    bands = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_bits"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.band_bits")

    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("long").alias("hamming"),
        )
        # filter BEFORE distinct: a pair found via k bands appears k times
        # with the SAME hamming, so the order is semantics-free — but the
        # distinct's shuffle shrinks from every candidate row to just the
        # survivors (17M -> ~1M at the x100 stress corpus, ~3x wall on the
        # pair stage)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: per-document count of distinct word
    n-grams shared with a benchmark corpus — the train/test-overlap audit a
    training-data pipeline runs before every release.

    Returns ``(id_col, n_shared_ngrams)`` for contaminated documents only
    (documents sharing at least one n-gram with the benchmark).

    Scale design: the benchmark side (eval sets) is tiny relative to the
    corpus, so its distinct n-gram set is BROADCAST — the 100 TB corpus
    explodes its shingles map-side and filters against the broadcast hash
    set without shuffling the corpus at all; the only exchange is the final
    per-document count over the (small) surviving hits.
    """
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(bench_text, n))).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("gram"),
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "gram")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shared_ngrams"))


def window_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicated-text measurement (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): hash every overlapping ``window``-token span, call
    a span duplicated when its digest occurs >= ``min_count`` times across
    the corpus (any documents, including twice within one), and report per
    document how many token positions are covered by at least one
    duplicated span.  Returns ``(id, n_tokens, dup_tokens, dup_frac)``.

    This is the substring-level complement to document-level MinHash: it
    catches long verbatim passages embedded in otherwise-distinct
    documents, which whole-document similarity structurally dilutes.  The
    published technique builds a corpus suffix array; the distributed
    restatement is windowed hashing — every W-token window digest is an
    exact witness for a repeated substring of length >= W, so flagged
    coverage equals the suffix-array answer at W-token resolution.

    Scale shape: windows are reduced to 32-char digests BEFORE the
    shuffle (the repeated-digest census moves digests, never text — the
    same discipline as `boilerplate_chunks`); the join back is digest
    equi-join; the coverage union explodes positions only for FLAGGED
    windows (corpus-frequency-capped by construction: a window digest
    repeated k times is exactly what the census found) and dedups them
    with one (id, pos) aggregation.  ``dup_frac`` is a single
    integer/integer division — exact-class, no float-grid corpus bound.
    """
    # tokenize + window-hash is per-row CPU; spread it across the cluster
    # (measured: 10.4s of a 12.4s wall in ONE task on the single-file
    # bench corpus — plans/r13/exact_substring_overlap_{before,after}.txt)
    df = _spread(df)
    base = df.select(
        F.col(id_col), shingles(text_col, window).alias("grams")
    )
    ntok = df.select(
        F.col(id_col),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "n_tokens"
        ),
    )
    # digest = TWO INDEPENDENT xxhash64 lanes (128 bits total, same
    # collision budget as md5 — ~2e-22 expected colliding pairs at 1e9
    # windows, ~2e-16 at the 100 TB design scale of 1e12) instead of a
    # 32-char md5 string: the census shuffles every window's digest, so 16
    # bytes of longs vs 32+ bytes of string halves the exchange, and
    # xxhash64 is a single codegen'd pass over the gram while md5
    # allocates a hex string.  Flat at sf0.1 where the exchange is small
    # (8.99 -> 8.86s min-of-2); 58.9 -> 53.2s warm single-rep at x100
    # where the census shuffle dominates — the win grows with scale.
    # The digest never leaves this operator, so engine-internal hashing
    # needs no oracle counterpart.
    #
    # Lane independence REQUIRES the literal FIRST in the second lane:
    # Spark's multi-arg xxhash64 chains left-to-right with the running
    # value as seed, so xxhash64(gram, lit(1)) = XXH64(1L, seed=d1) is a
    # deterministic function of d1 — any cross-gram d1 collision would
    # collide on d2 too, collapsing the pair to 64 bits (~0.03 expected
    # colliding pairs at 1e9 windows, O(1000) at 1e12).  With the literal
    # first, d2 = XXH64(gram, seed=XXH64(1L, 42)) is a different-seed
    # hash of the gram, independent of d1 (seed order pinned by
    # test_census_digest_lanes_independent; certified vs the md5 census
    # oracle at sf0.001/sf0.01 — scaled-tier re-certs live in SCALING.md).
    wins = base.select(
        F.col(id_col), F.posexplode("grams").alias("pos0", "gram")
    ).select(
        F.col(id_col),
        "pos0",
        F.xxhash64("gram").alias("d1"),
        F.xxhash64(F.lit(1), "gram").alias("d2"),
    )
    # census via a digest-partitioned window count, NOT groupBy + join-back:
    # a join-back consumes `wins` twice, planning the shingle+hash subtree
    # twice (the same double-plan class the containment operator hit); the
    # window form shuffles each digest row ONCE and reads the subtree once
    # (measured 14.9s -> 5.1s at sf0.1, identical output)
    dig_w = Window.partitionBy("d1", "d2")
    # coverage union WITHOUT exploding window positions: flagged windows
    # all have length `window`, so sorted by start the union is
    # first -> window tokens, each successor -> min(window, start delta)
    # (a lag over flagged rows only, instead of a W-fold position explode
    # + corpus-wide distinct)
    pos_w = Window.partitionBy(id_col).orderBy("pos0")
    covered = (
        wins.withColumn("cnt", F.count(F.lit(1)).over(dig_w))
        .filter(F.col("cnt") >= min_count)
        .withColumn("prev", F.lag("pos0").over(pos_w))
        .select(
            F.col(id_col),
            F.when(F.col("prev").isNull(), F.lit(window))
            .otherwise(F.least(F.lit(window), F.col("pos0") - F.col("prev")))
            .alias("contrib"),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("dup_tokens"))
    )
    return ntok.join(covered, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_frac"),
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All document pairs with shingle-Jaccard >= ``threshold`` — the SAME
    exact answer as :func:`jaccard_pairs` with no document-frequency cap —
    via AllPairs/PPJoin PREFIX FILTERING (Bayardo et al., WWW'07; Xiao et
    al., WWW'08) instead of the full posting self-join.

    Why a second exact algorithm: the plain posting self-join grows as
    sum(df^2) over shingles.  ``max_doc_freq`` bounds that by *discarding*
    high-frequency evidence (a semantics change the caller must accept);
    prefix filtering keeps EXACT semantics and still never joins on the
    frequent shingles, because they sort to the END of each document's
    frequency-ordered shingle list and the join only touches each
    document's PREFIX:

    * order every document's shingles by (global df asc, shingle asc) —
      rarest first; any fixed total order preserves correctness;
    * a pair with ``J >= t`` has ``|a ∩ b| >= ceil(t*|a|)`` (since
      ``J >= t`` implies overlap ``>= t*max(|a|,|b|)``), so the first
      ``|a| - ceil(t*|a|) + 1`` shingles of ``a`` must contain a common
      shingle — in fact the globally-smallest common shingle ``w`` sits
      inside BOTH prefixes (all shingles ordered before ``w`` in either
      document are non-common by ``w``'s minimality, and each side has
      at most ``|x| - overlap`` of them), so the prefix-to-prefix
      equi-join finds every qualifying pair;
    * candidates additionally pass the length filter
      ``t * max(|a|,|b|) <= min(|a|,|b|)`` in exact integer arithmetic;
    * each candidate pair is then VERIFIED exactly: both documents'
      full sorted shingle arrays are joined in (bounded by document
      length, never corpus size) and ``array_intersect`` recomputes the
      true overlap, so false candidates die and the output equals the
      brute-force definition bit-for-bit.

    Scale shape: the only data-sized exchanges are the df window (keyed
    on shingle), the per-document rank window (keyed on id), and the
    prefix self-join — whose per-shingle fan-out is df-of-PREFIX
    occurrences, concentrated on rare shingles by construction.  The
    threshold is parsed as an exact rational (``Fraction(str(t))``), so
    prefix lengths and length filters involve no float rounding.
    """
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    if not (0 < frac <= 1):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    postings = shingle_postings(df, id_col, text_col, n).persist()
    w_df = Window.partitionBy("shingle")
    w_doc = Window.partitionBy(id_col).orderBy("df", "shingle")
    w_sz = Window.partitionBy(id_col)
    ranked = (
        postings.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("n_sh", F.count(F.lit(1)).over(w_sz))
        .withColumn("rn", F.row_number().over(w_doc))
    )
    # ceil(t * n_sh) in exact integers: (num*n_sh + den - 1) div den.
    # The quotient fits a double exactly (inputs < 2^53), so floor(x/y)
    # after an exact-integer division is the true integer quotient.
    ceil_tn = F.floor(
        (F.lit(num) * F.col("n_sh") + F.lit(den - 1)) / F.lit(den)
    )
    # the prefix posting list feeds BOTH sides of the candidate self-join;
    # persist so the df/rank window chain (two exchanges over the full
    # posting list) runs once, not once per side (measured: four ~5s
    # 32-task window stages collapsed to two at sf0.1)
    prefix = (
        ranked.filter(F.col("rn") <= F.col("n_sh") - ceil_tn + 1)
        .select(id_col, "shingle", "n_sh", "rn")
        .persist()
    )

    # PPJoin positional filter (Xiao et al., WWW'08), exact: J >= t implies
    # overlap o >= t*(na+nb)/(1+t), i.e. o_req = ceil(num*(na+nb)/(num+den))
    # in exact integers.  For the candidate instance generated by the
    # GLOBALLY-SMALLEST common shingle (positions i, j in the two
    # frequency-ordered lists), everything ordered before it on either side
    # is non-common, so o <= 1 + min(na - i, nb - j).  Filtering every
    # instance by `1 + min(na - rn_a, nb - rn_b) >= o_req` therefore keeps
    # the minimal-shingle instance of every qualifying pair (bound >= true
    # o >= o_req) while pruning candidates whose prefixes only meet too
    # late to reach the required overlap — the distinct() below needs just
    # one surviving instance per pair, and every survivor is still exactly
    # verified.
    a, b = prefix.alias("a"), prefix.alias("b")
    o_req = F.floor(
        (
            F.lit(num) * (F.col("a.n_sh") + F.col("b.n_sh"))
            + F.lit(num + den - 1)
        )
        / F.lit(num + den)
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        # exact-integer length filter: t*max <= min
        .filter(
            (F.lit(num) * F.col("a.n_sh") <= F.lit(den) * F.col("b.n_sh"))
            & (F.lit(num) * F.col("b.n_sh") <= F.lit(den) * F.col("a.n_sh"))
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("a.n_sh") - F.col("a.rn"),
                F.col("b.n_sh") - F.col("b.rn"),
            )
            >= o_req
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    arrays = postings.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("sh"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    # the verification join is CPU-dense (array_intersect over full sorted
    # shingle arrays per candidate pair) on tiny bytes: pin its partition
    # count so AQE's size-based coalescing cannot serialize it (measured:
    # a 3-task 4.2s verify stage at sf0.1 with 29 cores idle)
    from tsdisagg_spark.operators._par import pin_compute_parallelism

    cand = pin_compute_parallelism(cand, "id_a")
    return (
        cand.join(
            arrays.select(
                F.col(id_col).alias("id_a"),
                F.col("sh").alias("sh_a"),
                F.col("n_sh").alias("size_a"),
            ),
            "id_a",
        )
        .join(
            arrays.select(
                F.col(id_col).alias("id_b"),
                F.col("sh").alias("sh_b"),
                F.col("n_sh").alias("size_b"),
            ),
            "id_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
