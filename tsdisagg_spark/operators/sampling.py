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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space for rate arithmetic — rates are exact multiples of 1/10000
BUCKETS = 10_000


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
