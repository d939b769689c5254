"""Deterministic sampling operators for training-data pipelines.

Domain mixing / corpus downsampling needs *reproducible* per-row decisions:
``df.sample()`` draws from a per-partition RNG, so the selected set changes
with partitioning, retries, and cluster size — unacceptable when a 100 TB
pipeline must be re-runnable and auditable.  These operators key every
decision off a content hash instead:

* the sampling decision for a row NEVER changes across runs, partitionings,
  or engines (md5 is engine-portable — the DuckDB oracles recompute the
  identical buckets);
* rates are exact in expectation and stable under data growth: a document
  kept at 30% stays kept when the corpus doubles;
* everything is a pure Catalyst expression — no RNG state, no UDF, no
  shuffle beyond what the caller already has.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket space for rate arithmetic — rates are exact multiples of 1/10000
BUCKETS = 10_000

#: Persisted DSIR index format version.  The cell table produced by
#: :func:`dsir_cell_table` is schema-tagged (column metadata on ``__lam``,
#: which Spark round-trips through parquet) with this version plus the
#: ``buckets``/``scale`` it was built with, and :func:`dsir_score` REFUSES
#: a table whose tag is missing or whose buckets disagree with the probe's
#: hashing modulus — a mismatch would silently join batch cells (hashed mod
#: the new buckets) against lambdas from the old modulus and score with
#: mixed moduli.  Bump this when the cell hashing or quantization contract
#: changes so stale persisted indexes fail loudly instead of scoring wrong.
DSIR_INDEX_FORMAT = 1


def hash_bucket(key: Column, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic sampling bucket in ``[0, buckets)``: the first 8 hex
    chars of ``md5(key || salt)`` as an integer, mod ``buckets``.

    md5 of the UTF-8 string is the cross-engine contract: Spark's ``md5`` /
    ``conv(hex, 16, 10)`` and DuckDB's ``md5`` / ``('0x' || hex)::BIGINT``
    produce the same integer, so oracles can recompute membership exactly.
    The ``salt`` decorrelates independent sampling decisions on the same key
    (e.g. a train/validation split after a downsampling pass).
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def sample_fraction(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, keyed on ``key_col``."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive:
    ``rates`` maps stratum values to keep-fractions (e.g. weight languages
    or sources differently); strata absent from ``rates`` fall back to
    ``default_rate``.

    The rate lookup compiles to a CASE expression and the membership test to
    the md5 bucket — the whole operator is a single codegen filter with full
    pushdown below it, so at 100 TB it rides the scan.
    """
    threshold = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], int(kv[1] * BUCKETS)),
        rates.items(),
        F.when(F.lit(False), 0),
    ).otherwise(int(default_rate * BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    group_cols: list[str] | None = None,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the top ``n``
    rows (per group) by the Efraimidis-Spirakis priority ``u^(1/w)``
    (Inf. Proc. Letters 97(5), 2006), with ``u`` a uniform md5 hash
    fraction of the key instead of RNG state.

    This is the distributed answer to weighted reservoir sampling: every
    executor computes priorities independently from the key bytes — no
    RNG seeds to coordinate, no sequential reservoir — and the global
    top-n is an ordinary rank.  Re-running on the same data returns the
    same sample (auditable lineage for training-corpus curation), and
    the priority is plain float arithmetic, so a SQL engine reproduces
    the exact same sample.

    Ranking uses ``log(u)/w`` (monotone in ``u^(1/w)``) for numerical
    sanity; ties on priority are broken by the key for cross-engine
    determinism.  Rows with non-positive weight are excluded.
    """
    gcols = list(group_cols or [])
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0  # avoid u == 0 -> log(0)
    ) / F.lit(float(2**32))
    pri = F.log(u) / F.col(weight_col)
    w = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    ).orderBy(F.desc("pri"), F.col(key_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("pri", pri)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .drop("pri", "rk")
    )


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture RESAMPLING — the epoch-weighting step that
    turns a curated corpus into a training mix (e.g. "see wikipedia 3.2
    times per epoch, common-crawl 0.6 times"): every row is emitted
    ``floor(w)`` times plus one more for the ``frac(w)`` md5-bucket slice
    of its stratum, each copy tagged with ``repeat_idx`` (0-based) so
    downstream shuffling/packing can decorrelate the copies.

    The fractional decision reuses :func:`hash_bucket` (salted, so it is
    independent of any earlier sampling pass on the same key); repeat
    counts are therefore a pure function of (key, stratum) — reproducible
    across runs, partitionings, and engines, like every sampler here.
    Upsampling complements :func:`stratified_sample` (which can only keep
    ``w <= 1`` fractions); together they express any non-negative mixture
    weight.

    Plan shape at 100 TB: one CASE expression computes the per-row count,
    ``explode(sequence(...))`` fans rows out map-side — no shuffle, no
    join, no RNG state; output size is exactly ``sum_s w_s * N_s`` rows
    and pushdown below the explode still reaches the scan.  Weights must
    be in ``[0, 10^4]``: negative is meaningless, and a larger repeat
    builds a per-row sequence array big enough to be an executor-memory
    mistake, not a mixture (raise here beats an opaque OOM)."""
    for sname, wv in list(weights.items()) + [("<default>", default_weight)]:
        if not (0.0 <= float(wv) <= 10_000.0):
            raise ValueError(
                f"mixture weight for {sname!r} is {wv}; must be in "
                "[0, 10000] (larger repeats explode a per-row array — "
                "split the pass instead)"
            )
    wcase = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], float(kv[1])),
        weights.items(),
        F.when(F.lit(False), 0.0),
    ).otherwise(float(default_weight))
    base = F.floor(wcase).cast("long")
    frac_buckets = F.round((wcase - F.floor(wcase)) * BUCKETS).cast("long")
    extra = (
        (hash_bucket(F.col(key_col), salt) < frac_buckets).cast("long")
    )
    repeats = (base + extra).alias("repeats")
    return (
        df.withColumn("repeats", repeats)
        .filter(F.col("repeats") > 0)
        .withColumn(
            "repeat_idx",
            F.explode(F.sequence(F.lit(0), F.col("repeats") - 1)),
        )
        .drop("repeats")
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    salt: str = "quota",
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by deterministic md5 hash
    order of the key — the domain-balancing cap a web corpus applies so no
    single host dominates the training mix.  Adds ``quota_rank`` (1-based
    position in the group's hash order).

    The selected set is exactly "the n smallest ``(md5(key||salt), key)``
    per group" — re-runnable, engine-portable, and independent of input
    partitioning.  A single window rank would force EVERY row of a group
    through one partition: at web scale the largest domain is exactly the
    group you cannot do that to.  So selection is hierarchical top-n:

    * phase 1 ranks within ``(group, hash(key) % n_salts)`` salted
      subgroups and keeps n per subgroup — the only pass that sees the full
      data, with per-partition fan-in bounded by n_salts * n regardless of
      group skew;
    * phase 2 re-ranks the <= n_salts * n survivors per group and keeps n.

    Because every group's true top-n is contained in the union of its
    salted subgroups' top-n, the two-phase result equals the single-window
    result row-for-row (the operator tests pin this equivalence).
    """
    hkey = F.concat(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.col(key_col).cast("string"),
    )
    sub = Window.partitionBy(
        F.col(group_col), F.pmod(F.hash(F.col(key_col)), F.lit(n_salts))
    ).orderBy(hkey)
    final = Window.partitionBy(group_col).orderBy(hkey)
    return (
        df.withColumn("__rk1", F.row_number().over(sub))
        .filter(F.col("__rk1") <= n)
        .withColumn("quota_rank", F.row_number().over(final))
        .filter(F.col("quota_rank") <= n)
        .drop("__rk1")
    )


def shard_assignment(
    df: DataFrame, key_col: str, n_shards: int, salt: str = "shard"
) -> DataFrame:
    """Deterministic training-shard assignment: adds ``shard`` in
    ``[0, n_shards)`` from the md5 bucket of the key — the export step that
    splits a curated corpus into equal-expectation shards for data-parallel
    training.

    Pure projection: no shuffle, no RNG, rides the scan.  The physical
    write is ``df.write.partitionBy("shard")`` (or ``repartition("shard")``
    first to get one file per shard); assignment is engine-portable so a
    SQL oracle reproduces every row's shard exactly, and re-exporting after
    an upstream change moves only the rows that actually changed.
    """
    return df.withColumn(
        "shard", (hash_bucket(F.col(key_col), salt) % n_shards).cast("int")
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Keep documents per group, in deterministic md5 order of the key,
    until the group's cumulative ``weight_col`` (token count) EXCEEDS
    ``budget`` — the token-budgeted mixture draw that assembles a
    training epoch ("this language gets 1B tokens"), where a row-count
    quota (:func:`quota_sample`) would over-sample short documents.

    Boundary rule: a document is kept iff the cumulative tokens BEFORE it
    is strictly under the budget, so the budget is always reached or
    exceeded when the group has enough material (the final document may
    overshoot; epochs want "at least B tokens", and truncation is the
    tokenizer's job downstream).  Returns the kept rows with
    ``cum_before`` (exact tokens admitted ahead of the row) — re-runnable
    and partitioning-independent, same determinism contract as
    :func:`quota_sample`.

    Scale shape: one ordered window per group computes the exclusive
    prefix sum in DECIMAL(38,0) (token counts x 10^10 rows stay inside
    the headroom rule).  The window sorts only ``(group, hash, weight)``
    projections, never document text; for web-scale skew (one language =
    half the corpus) swap the single window for the hierarchical
    prefix-sum decomposition proven in packing.py:sequence_packing — the
    admission rule is unchanged."""
    if budget < 1:
        raise ValueError(f"need budget >= 1, got {budget}")
    hkey = F.concat(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.col(key_col).cast("string"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(weight_col).cast("decimal(38,0)")).over(w),
        F.lit(0).cast("decimal(38,0)"),
    )
    return (
        df.withColumn("__h", hkey)
        .withColumn("__cum", cum_before)
        .filter(F.col("__cum") < budget)
        .select(
            *[c for c in df.columns],
            F.col("__cum").cast("long").alias("cum_before"),
        )
    )


def _dsir_cell_counts(
    docs, target, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, is_target, cell, count) hashed-bigram cell counts — the shared
    precursor of the cell table and the per-doc score.  Bigram cells use
    the engine's md5 convention (first 15 hex chars as a 60-bit integer,
    mod ``buckets`` — same cross-engine contract as :func:`hash_bucket`).
    One map-side-combined exchange keyed (id, cell)."""
    from tsdisagg_spark.operators.text import shingles

    from tsdisagg_spark.operators._par import spread_small_input

    docs = spread_small_input(docs)  # md5-per-bigram map stage: spread a few-file input
    grams = docs.select(
        F.col(id_col),
        target.alias("__t"),
        F.explode(shingles(text_col, n=2)).alias("__g"),
    ).select(
        id_col,
        "__t",
        (
            F.conv(F.substring(F.md5(F.col("__g")), 1, 15), 16, 10).cast(
                "long"
            )
            % buckets
        ).alias("__h"),
    )
    return grams.groupBy(id_col, "__t", "__h").agg(
        F.count(F.lit(1)).alias("__c")
    )


def _dsir_raw_tag(buckets: int) -> dict:
    return {"dsir_raw_format": DSIR_INDEX_FORMAT, "dsir_buckets": buckets}


def dsir_raw_cells(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """UNFINALIZED DSIR cell counts ``(__h, __th, __rh)`` — per hashed
    bigram cell, the target-side and rest-side gram counts, before any
    smoothing or log.  This is the SHARD-PARALLEL / STREAM-MERGEABLE
    half of the index build: counts are exact integer partial sums, so
    disjoint corpus shards build raw cells independently and
    :func:`dsir_merge_cells` folds them EXACTLY — the same key-grain
    merge contract as ``streaming.mv.merge_partial_aggregates`` (which
    it delegates to), so a live stream can keep the raw cells fresh per
    micro-batch and the index is re-finalized on demand.  The log-ratio
    table itself (:func:`dsir_finalize_cells`) is NOT mergeable — logs
    of smoothed ratios don't add — which is exactly why the raw grain
    is the persisted one (shards must partition the corpus by document).

    Schema-tagged ``dsir_raw`` with the bucket modulus; the scorer
    rejects a raw table (no ``dsir_index_format``)."""
    cnt = _dsir_cell_counts(docs, target, id_col, text_col, buckets)
    feat = cnt.groupBy("__h").agg(
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("__th"),
        F.sum(F.when(~F.col("__t"), F.col("__c")).otherwise(0)).alias("__rh"),
    )
    return feat.select(
        "__h",
        F.col("__th").alias("__th", metadata=_dsir_raw_tag(buckets)),
        "__rh",
    )


def dsir_merge_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two raw DSIR cell tables (:func:`dsir_raw_cells`) built
    from DISJOINT document sets: exact per-cell count addition via the
    streaming MV merge.  Validates both raw tags agree on format and
    bucket modulus (raises ``ValueError``) and re-attaches the tag the
    generic merge's projection drops."""
    from tsdisagg_spark.streaming.mv import merge_partial_aggregates

    tags = []
    for side, df in (("left", a), ("right", b)):
        meta = (
            dict(df.schema["__th"].metadata or {})
            if "__th" in df.columns
            else {}
        )
        if meta.get("dsir_raw_format") != DSIR_INDEX_FORMAT:
            raise ValueError(
                f"dsir_merge_cells: {side} input carries raw format "
                f"{meta.get('dsir_raw_format')!r}; this engine reads "
                f"format {DSIR_INDEX_FORMAT} — build with dsir_raw_cells()"
            )
        tags.append(meta.get("dsir_buckets"))
    if tags[0] != tags[1]:
        raise ValueError(
            f"dsir_merge_cells: bucket-modulus mismatch ({tags[0]} vs "
            f"{tags[1]}); merging would add counts from different cell "
            "spaces"
        )
    merged = merge_partial_aggregates(
        a, b, keys=("__h",), sum_cols=("__th", "__rh")
    )
    return merged.select(
        "__h",
        F.col("__th").alias("__th", metadata=_dsir_raw_tag(tags[0])),
        "__rh",
    )


def dsir_finalize_cells(cells: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Finalize raw DSIR cells into the broadcastable ``(__h, __lam)``
    index: per cell the add-one-smoothed quantized log ratio

        lambda_h = ln((t_h + 1) / (T + B)) - ln((r_h + 1) / (R + B))

    rounded to ``scale``-nats (micronats at the default), with the
    totals T/R summed over the input cells and B the tagged bucket
    modulus.  ``finalize(merge(raw(shard_i))) == dsir_cell_table
    (corpus)`` EXACTLY (test-pinned: counts merge exactly and both
    paths evaluate the identical expression on identical integers).
    Raises ``ValueError`` on an untagged input (the modulus enters the
    smoothing denominator — it must come from the tag, not a guess)."""
    meta = (
        dict(cells.schema["__th"].metadata or {})
        if "__th" in cells.columns
        else {}
    )
    if meta.get("dsir_raw_format") != DSIR_INDEX_FORMAT:
        raise ValueError(
            f"dsir_finalize_cells: input carries raw format "
            f"{meta.get('dsir_raw_format')!r}; this engine reads format "
            f"{DSIR_INDEX_FORMAT} — build with dsir_raw_cells() (the tag "
            "survives a parquet round-trip)."
        )
    buckets = meta["dsir_buckets"]
    # corpus totals as an unpartitioned window over the cell frame — at
    # most ``buckets`` rows by construction, so the single window task is
    # bounded at ANY corpus size.  The previous agg + crossJoin(broadcast)
    # made the totals a SECOND consumer of the cells subtree: in
    # dsir_importance_weights the two broadcast builds raced on the cold
    # (doc, cell) cache and the bigram md5 chain ran 3-4x per action
    # (stage-profiled: three extra full-corpus scans, ~8s task time each
    # at sf0.1).  Sums of identical integers — bit-identical lambdas.
    from pyspark.sql.window import Window as _W

    w_all = _W.partitionBy()
    cells = cells.withColumn("__tt", F.sum("__th").over(w_all)).withColumn(
        "__rr", F.sum("__rh").over(w_all)
    )
    return cells.select(
        "__h",
        F.round(
            scale
            * (
                F.log(F.col("__th") + 1)
                - F.log(F.col("__tt") + buckets)
                - F.log(F.col("__rh") + 1)
                + F.log(F.col("__rr") + buckets)
            )
        )
        .cast("long")
        .alias(
            "__lam",
            metadata={
                "dsir_index_format": DSIR_INDEX_FORMAT,
                "dsir_buckets": buckets,
                "dsir_scale": scale,
            },
        ),
    )


def _dsir_lambda(cnt: DataFrame, buckets: int, scale: int) -> DataFrame:
    """``(__h, __lam)`` quantized log-likelihood-ratio cell table from
    ``_dsir_cell_counts`` output — the one-shot composition of the
    cell aggregation (:func:`dsir_raw_cells`' core) and
    :func:`dsir_finalize_cells`; at fleet scale run the halves as
    separate jobs and fold shards with :func:`dsir_merge_cells`."""
    feat = cnt.groupBy("__h").agg(
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("__th"),
        F.sum(F.when(~F.col("__t"), F.col("__c")).otherwise(0)).alias("__rh"),
    )
    raw = feat.select(
        "__h",
        F.col("__th").alias("__th", metadata=_dsir_raw_tag(buckets)),
        "__rh",
    )
    return dsir_finalize_cells(raw, scale)


def dsir_cell_table(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """Build the persistable DSIR cell index ``(__h, __lam)`` from a
    reference corpus split into ``target`` (numerator distribution) and
    the rest (denominator).  See :func:`dsir_importance_weights` for the
    quantization contract; see :func:`dsir_score` for the probe side —
    together they are the incremental-ingest form of DSIR (index built
    once, every future batch scored at O(batch) with zero touches of the
    reference corpus)."""
    cnt = _dsir_cell_counts(docs, target, id_col, text_col, buckets)
    return _dsir_lambda(cnt, buckets, scale)


def dsir_score(
    docs: DataFrame,
    cell_table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    pre_counted: bool = False,
) -> DataFrame:
    """Score documents against a prebuilt DSIR ``cell_table``
    (:func:`dsir_cell_table`): per document with at least one bigram,
    ``(id_col, n_grams, weight_micronats)`` where the weight is the exact
    integer ``sum(count_dh * lambda_h)``.  Cells absent from the table
    (bigram cells the reference corpus never produced) contribute 0 —
    the smoothed ratio of an unseen cell is a constant the caller's
    top-k is invariant to only when batch docs share it; with the
    default 1024 all cells exist in any non-toy reference corpus.  The
    table MUST have been built with the same ``buckets``: the schema tag
    written by :func:`dsir_cell_table` is checked here and a missing or
    mismatched tag raises ``ValueError`` instead of scoring with mixed
    moduli (:data:`DSIR_INDEX_FORMAT`).

    ``pre_counted=True`` accepts ``_dsir_cell_counts`` output directly
    (internal reuse path for :func:`dsir_importance_weights`, which
    persists the counts across the table build and the scoring pass).

    Scale shape: the batch explodes and combines map-side; the cell
    table BROADCASTS — scoring never shuffles the reference corpus and
    costs O(batch)."""
    meta = (
        dict(cell_table.schema["__lam"].metadata or {})
        if "__lam" in cell_table.columns
        else {}
    )
    fmt = meta.get("dsir_index_format")
    if fmt != DSIR_INDEX_FORMAT:
        raise ValueError(
            f"DSIR cell table carries index format {fmt!r}; this engine "
            f"reads format {DSIR_INDEX_FORMAT}.  Untagged/stale tables "
            "cannot prove which bucket modulus built them — rebuild with "
            "dsir_cell_table() (the tag survives a parquet round-trip)."
        )
    if meta.get("dsir_buckets") != buckets:
        raise ValueError(
            "DSIR bucket-modulus mismatch: the cell table was built with "
            f"buckets={meta.get('dsir_buckets')} but the probe hashes mod "
            f"buckets={buckets}; scoring would silently join batch cells "
            "against lambdas from a different modulus.  Pass buckets="
            f"{meta.get('dsir_buckets')} or rebuild the index."
        )
    if pre_counted:
        cnt = docs.filter(~F.col("__t"))
    else:
        cnt = _dsir_cell_counts(
            docs, F.lit(False), id_col, text_col, buckets
        )
    return (
        cnt.join(F.broadcast(cell_table), "__h")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_grams"),
            F.sum(F.col("__c") * F.col("__lam")).cast("long").alias(
                "weight_micronats"
            ),
        )
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR hashed-bigram importance weights (Xie et al., "Data Selection
    for Language Models via Importance Resampling", NeurIPS 2023): score
    every document in the raw pool by how much its hashed-bigram profile
    looks like the ``target`` corpus rather than the pool itself.

    Features are word bigrams hashed into ``buckets`` cells via the
    engine's md5 convention (first 15 hex chars as a 60-bit integer, mod
    ``buckets`` — the same cross-engine contract as :func:`hash_bucket`,
    so a SQL oracle recomputes the cells exactly).  Per cell ``h`` the
    add-one-smoothed bag-of-bigrams log-likelihood ratio

        lambda_h = ln((t_h + 1) / (T + B)) - ln((r_h + 1) / (R + B))

    (``t_h``/``r_h`` the cell's occurrence counts in target/raw, ``T``/
    ``R`` the corpus totals, ``B`` = ``buckets``) is QUANTIZED to an
    integer — ``round(scale * lambda_h)`` micronats — so each document's
    importance weight ``sum(count_dh * lambda_h)`` is an exact INTEGER
    sum: order-independent, partitioning-independent, and hashable
    against an external oracle with no float-accumulation caveat.  (The
    only float step is one ln per cell, computed once on identical
    integer inputs in both engines before quantization.)

    Returns one row per raw-pool document with at least one bigram:
    ``(id_col, n_grams, weight_micronats)``.  Target documents define the
    numerator distribution and are not themselves scored.

    Scale shape (100 TB): bigram explode rides the scan; the only
    data-sized exchanges are the ``(doc, cell)`` count (map-side
    combined: keys collapse to at most ``buckets`` cells per document)
    and the final per-document sum.  The cell table is ``buckets`` rows —
    aggregated via a second map-side-combined exchange of at most
    ``buckets`` keys per partition, then BROADCAST back, so no join
    shuffles the corpus.  ``buckets`` trades variance for memory exactly
    as in the paper; 10^4-10^5 cells still broadcast for free."""
    # persisted: the (doc, cell) count feeds BOTH the cell-table build and
    # the final weight join — without it the bigram explode + first
    # exchange run twice over the whole corpus (same caller-managed
    # discipline as winnowing_shared_pairs' posting persist; bench's
    # between-rep cleanup unpersists)
    cnt = _dsir_cell_counts(docs, target, id_col, text_col, buckets).persist()
    lam = _dsir_lambda(cnt, buckets, scale)
    return dsir_score(cnt, lam, id_col=id_col, buckets=buckets, pre_counted=True)
