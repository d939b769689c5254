"""Skew-resistant join utilities.

AQE's skew-join splitting handles most hot keys at runtime, but it only
fires for sort-merge joins with statistics, and not for every shape
(stream-static joins, aggregation-feeding joins under a required
distribution, deliberately-hinted strategies).  Salting is the explicit
fallback: spread each hot key's rows over ``n_salts`` sub-keys and
replicate the other side per salt, so no single task owns a whole hot key.

Cost model: the non-salted side is replicated ``n_salts`` times through the
shuffle — use for a *medium* dimension (too big to broadcast, small enough
that n_salts copies are cheaper than one straggler task owning the hot
key's entire partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted.

    ``left`` (the skewed, large side) gets a deterministic salt in
    ``[0, n_salts)`` hashed from the full row — deterministic so results are
    reproducible run-to-run (no ``rand()``), row-dependent so a hot key's
    rows spread evenly.  ``right`` is replicated once per salt value and the
    join key becomes ``on + [salt]``.  The right side is hinted
    ``shuffle_hash``: if the right side were broadcastable, broadcasting
    would already neutralize skew and salting would be pure overhead — this
    utility exists precisely for the shuffle path.

    Only ``inner`` and ``left`` joins are supported: replicating the right
    side breaks right/full-outer semantics (unmatched right rows would
    appear ``n_salts`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(right/full outer would duplicate unmatched right rows)"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).cast("int")
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).hint("shuffle_hash")
    return left_s.join(right_s, [*on, "__salt"], how).drop("__salt")
