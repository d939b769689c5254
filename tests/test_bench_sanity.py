"""Bench canary (VERDICT r11 #7): a catastrophic plan regression — the
winnowing-class bug where Catalyst collapsed a multi-referenced hash
array INTO a higher-order lambda and turned a map-only selection into
an O(grams x window) re-evaluation — must fail the TEST SUITE, not
just surface as a silent wall-clock explosion in the round's bench.

Three headline queries run END-TO-END (noop sink, full computation) at
sf0.001 under a bound ~20x their steady-state cost: generous enough
that host noise can never flake it, tight enough that any
complexity-class regression (seconds -> minutes at this scale) trips
it.  The picks cover the three machinery families where such
regressions have bitten or would bite hardest: the higher-order-
function selection path (winnowing), the posting-self-join dedup path
(minhash), and the plain codegen aggregation path (pricing_summary) as
the control.
"""

import time

from tsdisagg_spark import queries as Q

SF = "/root/testdata/sf0.001"

#: (query, generous wall bound in seconds at sf0.001 on local[4+])
CANARIES = (
    ("pricing_summary", 60.0),
    ("minhash_near_dups", 90.0),
    ("winnowing_shared_pairs", 90.0),
)


def test_bench_canary_headline_walls(spark):
    from tsdisagg_spark.cacheutil import release_all

    # warm the session once so no canary pays first-job JVM costs
    Q.QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    for name, bound in CANARIES:
        start = time.perf_counter()
        Q.QUERIES[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - start
        release_all(spark)
        assert wall < bound, (
            f"{name} took {wall:.1f}s at sf0.001 (bound {bound}s) — "
            "complexity-class plan regression, see test module docstring"
        )
