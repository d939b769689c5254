"""Sequence packing: map an ordered token stream onto fixed-size training
bins (the pack-and-split step of an LLM pre-training data loader: documents
are concatenated in a deterministic order and the stream is cut every
``budget`` tokens; a document contributes to every bin its span crosses).

Scale design — the global prefix sum is the crux.  A naive
``sum().over(Window.orderBy(id))`` with no partition key collapses the whole
corpus into ONE task (Spark must see the entire ordering), which is the
classic accidental serialization.  Instead the prefix sum is hierarchical:

1. docs are range-bucketed on the ordering key (``bucket = id / bucket_size``
   keeps buckets contiguous in stream order),
2. per-bucket token totals (one tiny row per bucket) are cum-summed and
   broadcast back as bucket offsets,
3. the within-bucket running sum is an ordinary partitioned window.

Step 2's aggregate is one row per ~bucket_size documents — at 10^9 docs and
bucket_size 10^6 that is a 1000-row broadcast, so every stage stays fully
parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_stream(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign each document to the training bins its token span crosses.

    Documents are ordered by ``id_col`` (the deterministic stream order),
    token counts are whitespace-word counts (the same definition as
    :func:`tsdisagg_spark.operators.text.words`), and the concatenated
    stream is cut every ``budget`` tokens.  Returns one row per
    (document, bin) with the token overlap:

    ``(id_col, n_tokens, bin_id, tokens_in_bin)``

    Note the canonical tokenizer maps empty/whitespace-only text to ``['']``
    (one token) in both Spark and DuckDB, so every document occupies at
    least one stream position; the ``n_tokens > 0`` filter guards the
    hypothetical zero-count only.  The sum of
    ``tokens_in_bin`` per document equals ``n_tokens``, and the sum per bin
    equals ``budget`` for every bin but the last — both invariants are
    SQL-checkable.
    """
    from tsdisagg_spark.operators.text import words

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    counts = (
        df.select(
            F.col(id_col),
            F.size(words(F.col(text_col))).cast("long").alias("n_tokens"),
            # integer `div`, not float division: exact for any long (doubles
            # round above 2^53, which a 100 TB token stream can reach)
            F.expr(f"CAST({id_col} AS BIGINT) div {bucket_size}").alias("__bucket"),
        )
        .filter(F.col("n_tokens") > 0)
    )

    # bucket totals -> exclusive running offset per bucket (tiny: one row per
    # bucket_size docs).  The cumsum window here is single-partition but over
    # bucket COUNT rows, not doc rows.
    bucket_offsets = (
        counts.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__bucket_total"))
        .withColumn(
            "__bucket_offset",
            F.coalesce(
                F.sum("__bucket_total").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bucket", "__bucket_offset")
    )

    w = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        counts.join(F.broadcast(bucket_offsets), "__bucket")
        .withColumn(
            "__start",
            F.col("__bucket_offset") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn("__end", F.col("__start") + F.col("n_tokens"))  # exclusive
    )

    first_bin = F.expr(f"__start div {budget}")
    last_bin = F.expr(f"(__end - 1) div {budget}")
    binned = spans.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("__start"),
        F.col("__end"),
        F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
    )
    bin_lo = F.col("bin_id") * budget
    bin_hi = bin_lo + budget
    return binned.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("bin_id"),
        (F.least(F.col("__end"), bin_hi) - F.greatest(F.col("__start"), bin_lo))
        .alias("tokens_in_bin"),
    )
