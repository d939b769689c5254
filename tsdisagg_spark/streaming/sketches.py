"""Streaming frequency sketching: live heavy-hitter candidate
maintenance over an unbounded key stream with BOUNDED state.

The batch side of this story is ``operators/sketches.py:
heavy_hitters_exact`` (per-partition Misra-Gries candidates + broadcast
exact recount).  A stream cannot recount — the history is gone — so the
streaming form maintains the MERGEABLE half only: per-shard Misra-Gries
summaries held as ``applyInPandasWithState`` state, k counters per
shard no matter how many events flow through.  The lambda-architecture
read is: candidates (with per-shard error bounds) live and cheap from
the state store; the exact recount, when needed, is the batch operator
over the archived stream.

Correctness contract (pinned by
tests/test_operators.py::test_stream_heavy_hitters_guarantee):

* Keys are hash-SHARDED, so a key's entire count lives in ONE shard.
  A key with global count C > n_s/(k+1) on its shard (n_s = that
  shard's event count) always survives that shard's summary — so with
  balanced shards, per-shard k ~ K_target/n_shards counters suffice to
  catch every global C > n/K_target hitter (Misra & Gries 1982;
  Agarwal et al., "Mergeable Summaries", PODS'12).
* Every reported count is a LOWER bound, and
  ``count <= true count <= count + decremented`` per shard — the
  summary carries its own error certificate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reserved dict key for NULL stream keys inside the Misra-Gries state —
#: NUL-prefixed, so no cast-to-string value can collide with it (ADVICE
#: r12: None/NaN previously folded into "" / "nan"); emitted back as a
#: NULL key in the output
_NULL_KEY = "\x00<null>"

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
        T.StructField("decremented", T.LongType()),
    ]
)

_HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("lower_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("decremented", T.LongType()),
    ]
)


def mg_merge(
    counts: dict, batch_counts: dict, k: int, decremented: int
) -> tuple[dict, int]:
    """One Misra-Gries merge step: absorb ``batch_counts`` (exact counts
    for a batch) into a summary of at most ``k`` counters.  After the
    plain addition, one subtraction of the (k+1)-th largest count
    restores the bound (everything at or below it goes non-positive),
    and the running ``decremented`` total is the summary's error
    certificate: for every key, true count on this substream lies in
    ``[count, count + decremented]``.  Deterministic: ties in the
    compression cut are resolved by the count ordering alone (all keys
    with count <= the cut are dropped together).  Pure function so the
    batch and streaming paths share it exactly — the input dict is
    copied at entry (ADVICE r12: the no-compression path previously
    returned the caller's dict mutated in place, so a caller that
    retained it would double-count)."""
    counts = dict(counts)
    for key, c in batch_counts.items():
        counts[key] = counts.get(key, 0) + int(c)
    if len(counts) > k:
        cut = sorted(counts.values(), reverse=True)[k]
        counts = {key: c - cut for key, c in counts.items() if c > cut}
        decremented += cut
    return counts, decremented


def stream_heavy_hitter_candidates(
    events: DataFrame,
    key_col: str,
    k: int,
    n_shards: int = 32,
) -> DataFrame:
    """Maintain live heavy-hitter candidates over a key stream:
    ``n_shards`` Misra-Gries summaries of ``k`` string-key counters
    each, held in the state store — total state ``n_shards x k``
    counters, independent of stream volume.  Each trigger emits the
    surviving counters of every shard the batch touched, tagged with
    the shard's event total and decrement certificate (append mode:
    the latest emission per shard supersedes earlier ones).

    The per-batch fold is the same :func:`mg_merge` the guarantee test
    drives in batch mode: the batch's rows reduce to exact per-key
    counts FIRST (one pandas value_counts — the map-side combine), so
    state work per trigger is O(distinct keys in batch + k), not
    O(rows)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (shard,) = key
        if state.exists:
            keys, counts, n_seen, decremented = state.get
            summary = dict(zip(keys, counts))
        else:
            summary, n_seen, decremented = {}, 0, 0
        batch: dict = {}
        for pdf in pdf_iter:
            vc = pdf["__key"].value_counts(dropna=False)
            for kk, c in vc.items():
                # NULL keys: pandas surfaces them as None OR NaN
                # (version-dependent), and str(NaN) would collide with a
                # real 'nan' token while "" would collide with a real
                # empty string (ADVICE r12).  A NUL-prefixed sentinel is
                # unreachable from cast-to-string values; it is translated
                # back to a NULL key on emit below.
                kk = _NULL_KEY if pd.isna(kk) else str(kk)
                batch[kk] = batch.get(kk, 0) + int(c)
                n_seen += int(c)
        summary, decremented = mg_merge(summary, batch, k, decremented)
        state.update(
            (
                list(summary.keys()),
                [int(c) for c in summary.values()],
                int(n_seen),
                int(decremented),
            )
        )
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(summary),
                # the internal sentinel never leaves the state machinery
                "key": [
                    None if kk == _NULL_KEY else kk for kk in summary
                ],
                "lower_count": [int(c) for c in summary.values()],
                "n_seen": [int(n_seen)] * len(summary),
                "decremented": [int(decremented)] * len(summary),
            }
        )

    keyed = events.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
        F.col(key_col).cast("string").alias("__key"),
    )
    return keyed.groupBy("__shard").applyInPandasWithState(
        update,
        outputStructType=_HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
