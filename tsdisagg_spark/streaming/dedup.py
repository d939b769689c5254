"""Streaming ingest dedup — probing a DOCUMENT STREAM against the static
MinHash band index (``operators.dedup.minhash_band_index``), the
continuous topology of the batch ``incremental_minhash_dedup`` shape.

Why this needs its own signature path: the batch
``minhash_signatures`` computes each slot as a ``groupBy(doc).min``
over the exploded posting list — on a stream that is a stateful
aggregation (watermarks, late-emit, state store) for something that is
logically a PER-DOCUMENT pure function.  :func:`rowwise_minhash_signatures`
computes the identical slot values inside the row
(``array_min(transform(...))`` over the document's own distinct shingle
hashes — bit-equal to the groupBy formulation, pinned by test), so the
stream stays STATELESS end-to-end:

    doc stream -> row-wise signature -> band keys -> stream-static
    equi-join against the index -> candidate (batch_id, corpus_id) rows

Stream-static inner joins keep no state, and every candidate row for a
document is produced inside that document's own micro-batch — so exact
verification (a distinct + shingle-set intersection, both batch
operations) runs per micro-batch in ``foreachBatch`` via
:func:`verify_probe_candidates`.  The per-row formulation evaluates the
hash lambda interpreted (2-4x slower per doc than the batch explode —
the measured trade recorded on ``minhash_signatures``); at ingest rates
the batch is small and statelessness is worth far more than the
constant.

Batch twin: running the same three calls on a static frame reproduces
``operators.dedup.minhash_probe`` exactly (identical signatures ->
identical candidates -> identical exact verification; pinned by test),
which is what makes the streaming path oracle-auditable through its
batch twin ``incremental_minhash_dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdisagg_spark.operators.dedup import _band_entries, _doc_shingle_sets
from tsdisagg_spark.operators.text import _shingles_sql, shingles


def rowwise_minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Shuffle-free MinHash signatures: ``(id, sig array<int>)`` computed
    entirely inside each row — slot i is
    ``array_min(transform(distinct_shingle_hashes, h -> hash(h, i)))``,
    the same min over the same hashed set as the batch groupBy
    formulation, so the VALUES are identical (test-pinned).  Documents
    with no shingles (shorter than ``n`` words) produce no row, matching
    the batch path where they have no postings to aggregate.

    Staged projections on purpose: higher-order functions are not
    common-subexpression-eliminated, so the shingle-hash array is named
    once and each slot's lambda reads the named column (the containment
    union lesson: an inline repeat re-evaluates the whole chain per
    reference)."""
    staged = docs.select(
        F.col(id_col),
        F.array_distinct(
            F.expr(
                "transform(" + _shingles_sql(text_col, n) + ", s -> xxhash64(s))"
            )
        ).alias("__hs"),
    ).filter(F.size("__hs") > 0)
    sig = F.expr(
        "array("
        + ", ".join(
            f"array_min(transform(__hs, h -> hash(h, {i})))"
            for i in range(num_hashes)
        )
        + ")"
    ).alias("sig")
    return staged.select(F.col(id_col), sig)


def stream_probe_candidates(
    docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs ``(batch_id, corpus_id)`` for a document
    STREAM (or batch frame) against a static band index: row-wise
    signatures -> band keys -> stream-static equi-join.  Entirely
    STATELESS — no watermark, no state store; a pair found via k bands
    appears k times and is collapsed by the per-micro-batch verifier
    (``distinct`` here would be a stateful streaming operator for rows
    that only ever co-occur within one micro-batch anyway).  ``index``
    must come from ``minhash_band_index`` with the same parameters."""
    rows = num_hashes // bands
    entries = _band_entries(
        rowwise_minhash_signatures(docs, id_col, text_col, n, num_hashes),
        id_col,
        bands,
        rows,
    )
    q, x = entries.alias("q"), index.alias("x")
    return (
        q.join(x, ["band", "band_hash"])
        .filter(F.col(f"q.{id_col}") != F.col(f"x.{id_col}"))
        .select(
            F.col(f"q.{id_col}").alias("batch_id"),
            F.col(f"x.{id_col}").alias("corpus_id"),
        )
    )


def verify_probe_candidates(
    candidates: DataFrame,
    batch_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of probe candidates — the
    ``foreachBatch`` body: collapse band duplicates, re-shingle ONLY the
    candidate documents on each side (semi-join pushdown), intersect, and
    keep pairs at ``jaccard >= threshold``.  All batch operations: inside
    a micro-batch callback ``candidates`` is a plain DataFrame.  Returns
    ``(batch_id, corpus_id, jaccard)`` — the same contract as the batch
    ``minhash_probe``."""
    cand = candidates.select("batch_id", "corpus_id").distinct()
    b_sets = _doc_shingle_sets(
        batch_docs,
        cand.select(F.col("batch_id").alias(id_col)).distinct(),
        id_col,
        text_col,
        n,
    ).select(F.col(id_col).alias("batch_id"), F.col("sh").alias("sh_b"))
    c_sets = _doc_shingle_sets(
        corpus,
        cand.select(F.col("corpus_id").alias(id_col)).distinct(),
        id_col,
        text_col,
        n,
    ).select(F.col(id_col).alias("corpus_id"), F.col("sh").alias("sh_c"))
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    return (
        cand.join(b_sets, "batch_id")
        .join(c_sets, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("sh_b") + F.size("sh_c") - inter), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )
