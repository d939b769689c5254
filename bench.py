"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints the full result as a JSON line to stdout:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``
followed by a compact summary JSON line (same fields minus the per-query
map) as the FINAL stdout line — the driver records only a ~2000-char tail
of stdout, which decapitates the full line on long runs (BENCH_r04/r06
``parsed: null``); the compact last line always fits and parses.  The full
per-query map is also mirrored to ``bench_out.json``.

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collection) after a warm-up of the session and file metadata.

Each query is timed ``BENCH_REPS`` times (default 2) and the MINIMUM is
reported.  The min is the standard steady-state estimator on a shared
host: the first execution pays one-time costs that are environment, not
query work (JVM JIT warm-up for that plan shape, parquet footer/page-cache
misses, codegen compilation), and round-to-round comparisons on this box
showed up to 1.5x wall-clock swings from co-tenant CPU contention that
min-of-2 collapses to a few percent.  Set ``BENCH_REPS=1`` for cold-run
timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline set: one representative per machinery family
HEADLINE = [
    "pricing_summary",         # wide hash aggregation over the fact table
    "regional_revenue",        # 5-way star join with broadcast dims
    "monthly_revenue_delta",   # period agg + ordered window
    "prorata_disagg",          # relational disaggregation (2 aggs + joins)
    "disagg_chow_lin_priority",  # grouped-kernel GLS disaggregation (5 series)
    "disagg_chow_lin_suppliers",  # many-series GLS (1000 series at sf0.1)
    "sessionization",          # per-user windows over events
    "events_hourly",           # tumbling-window aggregation
    "jaccard_near_dups",       # shingle self-join dedup
    "minhash_near_dups",       # MinHash LSH + verification
    "incremental_minhash_dedup",  # batch probe vs persistable band index
    "knn_bruteforce",          # broadcast cosine top-k
    "knn_ivf",                 # inverted-file ANN (probe-list equi-join)
    "session_windows",         # native session windows (gap merging)
    "embedding_dup_exact",     # all-pairs cosine near-dup baseline
    "media_features",          # Arrow-batched mapInPandas decode pipeline
    "decontamination",         # broadcast benchmark-gram overlap audit
    "repetition_stats",        # shuffle-free per-doc repetition signals
    "simhash_near_dups",       # provably-exact banded SimHash dedup
    "incremental_simhash_dedup",  # batch probe vs wide-code band index
    "dedup_components",        # iterative large-star/small-star clustering
    "sequence_packing",        # hierarchical prefix sum + bin explode
    "events_sliding",          # overlapping hop-window aggregation
    "events_asof_purchase",    # as-of join via union + ordered window
    "gap_fill_nation",         # timeline completion + linear interpolation
    "tfidf_top_terms",         # corpus indexing: tf x idf + per-doc top-k
    "supplier_region_summary", # distinct-heavy star join over broadcast dims
    "signup_funnel",           # ordered multi-stage event funnel
    "order_value_histogram",   # equi-width bucketing off a broadcast min/max
    "revenue_rollup",          # GROUP BY ROLLUP hierarchy aggregation
    "returnflag_pivot",        # pivoted aggregation (flag x status grid)
    "order_value_percentiles", # exact percentile aggregation per group
    "order_value_winsorized",  # percentile bounds broadcast-joined back
    "rolling_revenue",         # trailing-window stats, single Window node
    "doc_chunks",              # codegen document slicing (1-to-N explode)
    "embedding_quantize",      # vectorized int8 quantization over arrays
    "stratified_sample",       # deterministic md5-bucket stratified sample
    "wav_feature_quanta",      # REAL WAV decode through mapInPandas
    "ppm_feature_quanta",      # REAL PPM image decode through mapInPandas
    "priority_status_cube",    # CUBE grouping-sets aggregation
    "large_orders",            # aggregate-HAVING semi-join (Q18 shape)
    "kmeans_assign_update",    # one distributed Lloyd round (GEMM-free expr path)
    "boilerplate_chunks",      # repeated-paragraph digests across documents
    "daily_weekly_active",     # DAU/WAU contribution fan-out
    "ppm_resize_quanta",       # REAL box-average image resize
    "spearman_corr_flags",     # rank windows feeding an algebraic corr
    "order_value_mad_outliers",  # nested median-of-residuals robust stats
    "similar_part_names",      # blocked edit-distance record linkage
    "similar_part_names_segments",  # PassJoin content-addressed segment blocking
    "bmp_feature_quanta",      # REAL BMP decode (third genuine container)
    "nation_revenue_share",    # unordered full-partition window shares
    "revenue_range_window",    # value-based RANGE frame over gapped days
    "user_activity_islands",   # gaps-and-islands run detection
    "customer_spend_ranks",    # percent_rank/cume_dist/ntile ranking family
    "bloom_membership_audit",  # broadcast Bloom sketch build + probe + grade
    "cms_order_counts",        # count-min sketch build + point queries
    "kmv_distinct_customers",  # KMV distinct-count sketch vs exact
    "hll_distinct_users",      # HLL registers via grouping sets + union merge
    "order_custkey_skew",      # join-key skew profile (sort-free quantiles)
    "vocab_oov_by_source",     # top-V vocabulary + per-source OOV budget
    "doc_length_drift",        # exact KS drift vs the reference source
    "partkey_selfjoin_cardinality",  # exact join size without the join
    "daily_distinct_users",    # per-window HLL (streaming twin, batch mode)
    "nation_trade_pagerank",   # iterative graph: 5 power-iteration joins
    "wav_decimate_quanta",     # REAL audio decimation through mapInPandas
    "weighted_sample_orders",  # deterministic weighted sampling (ES priorities)
    "shipping_priority",       # TPC-H Q3: pushdown star join + top-k
    "promo_revenue_share",     # TPC-H Q14: conditional-aggregate share
    "peak_concurrency",        # day-partitioned interval sweep line
    "kmv_buyer_overlap",       # theta-sketch set intersection
    "cohort_retention",        # window-min cohorts + distinct-active cells
    "part_basket_lift",        # basket-array pair generation + lift
    "seasonal_decomposition",  # integer-cents 2x12 MA decomposition
    "bigram_lm_scores",        # corpus-fit bigram LM scoring joins
    "min_cost_supplier",       # Q2 shape: correlated MIN as window
    "sole_late_supplier",      # Q21 shape: fact-fact join + shared-key agg
    "bloom_pruned_urgent_revenue",  # bloom pre-filtered selective join
    "idle_customers",          # Q22 shape: scalar threshold + anti-join
    "containment_near_dups",   # directed Broder containment (posting self-join)
    "tfidf_cosine_near_dups",  # sparse tf-idf cosine pairs (term self-join)
    "pricing_summary_exact",   # Q1 in exact integer units (scale-stable)
    "monthly_revenue_delta_exact",  # W1 deltas in integer cents (x1000-stable)
    "revenue_rollup_exact",    # ROLLUP certified in undivided cents
    "order_value_histogram_exact",  # integer-cent bucket edges, no doubles
    "seasonal_decomposition_exact",  # decomposition's integer state certified
    "semantic_dedup",          # SemDeDup: cluster-blocked embedding dedup
    "domain_quota_sample",     # salted two-phase per-domain top-n cap
    "training_shards",         # md5 shard manifests (pure projection + agg)
    "exact_substring_overlap", # ExactSubstr window census + coverage union
    "incremental_semantic_dedup",  # batch probe vs persistable cluster index
    "bm25_search",             # BM25 lexical retrieval top-k
    "mixture_resample",        # epoch-mixture upsampling (map-side explode)
    "order_snapshot_diff",     # CDC full-outer snapshot reconciliation
    "events_in_incident_windows",  # keyless range join (bucketized intervals)
    "session_incident_overlap",  # interval x interval overlap join (exactly-once buckets)
    "indicator_lead_lag",      # lead-lag indicator selection (exact-corr best pick)
    "order_value_grid_quantiles",  # exact histogram quantiles, sort-free
    "pq_codes",                # product-quantization encode (explode + broadcast codebook)
    "pq_adc_topk",             # asymmetric-distance top-k over 8-byte codes
    "nation_monthly_ewma",     # sequential-fold EWMA (higher-order aggregate)
    "heavy_hitter_tokens",     # Misra-Gries candidates + exact recount
    "jaccard_prefix_near_dups",  # AllPairs prefix-filtered exact similarity join
    "copurchase_kcore",        # iterative k-core peeling to fixpoint
    "chunk_dedup_clean",       # exact span removal + document reassembly
    "doc_novelty",             # corpus-order novel-gram fraction per doc
    "nation_monthly_trend",    # per-group exact-integer OLS screening
    "order_pareto_frontier",   # 2-D skyline via grid decomposition
    "nation_forecast_backtest",  # naive vs seasonal-naive exact MAE screen
    "nation_revenue_cusum",    # two-sided CUSUM drift fold per series
    "nation_theil_sen",        # robust median-of-pairwise-slopes trend
    "incremental_novelty",     # batch-vs-index gram novelty probe
    "purchase_touch_attribution",  # range-frame window attribution
    "embedding_gram",          # exact fixed-point Gram via batched GEMM
    "embedding_pca_scores",    # PCA: exact-stat fit + Arrow GEMM project
    "signup_purchase_latency", # conversion-latency exact percentiles
    "lang_token_budget_sample",  # token-budgeted per-language epoch draw
    "event_transition_matrix", # per-user Markov step census
    "order_priority_pending",  # Q4 shape: correlated-EXISTS semi join
    "supplier_cardinality_by_part",  # Q16 shape: distinct-pair cardinality + NOT IN
    "disjunctive_part_revenue",  # Q19 shape: OR-of-conjunctions pushdown
    "ship_lag_priority_mix",   # Q12 shape: CASE-aggregated fact-fact join
    "embedding_pca_parseval",  # full-basis PCA norm-preservation certifier
    "media_features_exact",    # decode stats in exact integer quanta
    "incremental_chunk_dedup", # batch span-removal probe vs chunk index
    "hybrid_rrf_search",       # BM25 + cosine legs fused by reciprocal rank
    "pmi_collocations",        # corpus bigram PMI collocation screen
    "winnowing_fingerprints",  # MOSS winnowing: windowed-min gram hashes
    "winnowing_shared_pairs",  # winnowing postings self-join pair census
    "incremental_winnowing_dedup",  # batch probe vs winnowing posting index
    "gopher_quality_filter",   # Gopher-rule admission audit per lang/source
    "dsir_importance_sample",  # DSIR hashed-bigram importance resampling
    "small_quantity_revenue",  # Q17 shape: fact joined to its own aggregate
    "zipf_slope_by_source",    # rank-frequency Zipf exponent per source
    "incremental_dsir_score",  # batch DSIR probe vs broadcast cell index
    "temperature_mixture_weights",  # p^alpha language mixing weights
    "top_supplier_revenue",    # Q15 shape: agg + global-max equality join
    "token_entropy",           # shuffle-free per-doc unigram entropy fold
    "ngram_coverage_curve",    # top-k vocabulary token-mass coverage
    "discount_band_revenue",   # Q6 shape: pure scan-filter-aggregate
    "returned_item_customers", # Q10 shape: fact-fact join + TakeOrdered
    "nation_pair_trade",       # Q7 shape: pair-pruned two-broadcast star
    "source_drift_jsd",        # per-source JSD token-mix drift screen
    "daily_event_mix_drift",   # per-day categorical event-mix drift
    "daily_value_psi",         # numeric PSI drift over reference-decile bins
    "late_event_audit",        # watermark-delay sizing: late-arrival census
    "customer_spend_gini",     # revenue-concentration inequality per segment
    "incremental_monthly_revenue",  # MV delta merge == full recompute
    "customer_order_distribution",  # Q13 shape: zero-inclusive histogram
    "large_volume_customers",  # Q18 shape: HAVING-sum pushdown + TakeOrdered
    "waiting_suppliers_topk",  # Q21 canonical: numwait ranks, status filter
    "global_sales_opportunity",  # Q22 shape: scalar threshold + anti-join
    # dedup_canonical is intentionally not timed: it is jaccard_near_dups +
    # dedup_components (both timed above) plus two broadcast joins;
    # dup_graph_triangles likewise rides jaccard_near_dups plus two
    # edge-list joins; ingest_audit rides incremental_minhash_dedup (timed)
    # plus a projection and one left join
]

REPS = max(1, int(os.environ.get("BENCH_REPS", "2")))

#: comma-separated query names to skip (scale-stress runs exclude the
#: explicitly-labeled quadratic oracle baselines, e.g. embedding_dup_exact
#: at 100x the corpus)
SKIP = {
    s.strip()
    for s in os.environ.get("BENCH_SKIP", "").split(",")
    if s.strip()
}

#: comma-separated allowlist — when set, ONLY these headline queries run
#: (e.g. the relational core at a 100x stress where per-query wall times
#: make the full set impractical)
ONLY = {
    s.strip()
    for s in os.environ.get("BENCH_ONLY", "").split(",")
    if s.strip()
}


def _cpu_jiffies() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat — the direct hypervisor
    co-tenant signal.  Load averages conflate the bench's own 32 threads
    with external pressure; steal time does not."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(before: tuple[int, int] | None) -> float | None:
    after = _cpu_jiffies()
    if before is None or after is None:
        return None
    return round(
        100.0 * (after[0] - before[0]) / max(1, after[1] - before[1]), 2
    )


def main() -> None:
    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.cacheutil import release_all
    from tsdisagg_spark.spark.session import get_spark

    # host-noise marker, sampled BEFORE the run starts (VERDICT r11 #1:
    # the r11 +31% headline could not be attributed because only the
    # post-run load was recorded and per-query maps were overwritten)
    load_before = [round(x, 2) for x in os.getloadavg()]

    # load qualification (VERDICT r12 #5, tightened per VERDICT r13 #1):
    # the r12 official run started at 1-min load ~5 and read 167.5s where
    # the quiet round-end read 150.6s; the r13 driver run started at
    # 1-min load 2.23 with the 5-MIN average at 5.15 and read 2.4x
    # inflated — a 1-min-only gate let a busy host through undetected.
    # Gate on max(load1, load5).  If the host is busy at start, wait (up
    # to twice, since the 5-min average decays slowly) and re-sample; if
    # it is STILL busy, run anyway (the driver needs a number) but stamp
    # the artifact ``degraded`` so round-over-round comparisons can
    # discount it without forensics.
    load_gate = float(os.environ.get("BENCH_LOAD_GATE", "4.0"))
    degraded = False
    for attempt in range(2):
        if max(load_before[0], load_before[1]) <= load_gate:
            break
        print(
            f"  load_before max(1m,5m)={max(load_before[0], load_before[1])} "
            f"> gate {load_gate}; waiting 120s for the averages to decay "
            f"(attempt {attempt + 1}/2)",
            file=sys.stderr,
        )
        time.sleep(120)
        load_before = [round(x, 2) for x in os.getloadavg()]
    if max(load_before[0], load_before[1]) > load_gate:
        degraded = True
        print(
            f"  still loaded ({load_before}) after the retries — "
            "tagging this run degraded=true",
            file=sys.stderr,
        )

    jiffies_before = _cpu_jiffies()

    spark = get_spark(
        app_name="tsdisagg-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, parquet footers, Python worker pool
    registry.QUERIES["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # spawn the Arrow Python worker pool too (one daemon per core, ~100ms
    # each): a trivial applyInPandas touches every slot so no measured query
    # pays the one-time fork cost — environment setup, not query work
    import pandas as _pd
    from pyspark.sql import functions as _F

    (
        spark.range(int(CPUS) * 4)
        .withColumn("g", _F.col("id") % int(CPUS))
        .repartition(int(CPUS), "g")
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, schema="id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    timings: dict[str, float] = {}
    # mid-run load watermark (VERDICT r13 #8): a co-tenant spike that
    # starts AFTER the gate passes (the r13 1.1 -> 9.7 case) is invisible
    # in load_before; track the max 1-min average observed between
    # queries so the artifact itself shows whether the run stayed quiet.
    load_max = load_before[0]
    for name in HEADLINE:
        if name in SKIP or (ONLY and name not in ONLY):
            print(f"  {name}: skipped (BENCH_SKIP/BENCH_ONLY)", file=sys.stderr)
            continue
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(REPS):
            start = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
            # queries that persist() intermediates would hand the next rep
            # a warm cache — not a steady-state effect we want to count,
            # so drop any blocks a query pinned before measuring again.
            # Deliberate side effect: this also disables CROSS-query plan
            # cache reuse (e.g. dedup_components re-deriving
            # jaccard_near_dups' persisted pair list), so every headline
            # number is the query's standalone cost — comparable across
            # bench orderings, at the price of timing shared subplans
            # twice.  Must be release_all, not bare clearCache(): the
            # iterative graph queries (dedup_components,
            # nation_trade_pagerank, copurchase_kcore) leave
            # localCheckpoint blocks the catalog's cache manager cannot
            # see (cacheutil module docstring), so clearCache alone made
            # the end-of-run zero-leak gate below unsatisfiable and
            # aborted the whole run (BENCH_r07 rc=1).  Safe here because
            # each rep re-invokes ``fn`` for a fresh plan — no released
            # checkpoint block is ever re-referenced.
            release_all(spark)
        timings[name] = round(best, 3)
        load_max = max(load_max, os.getloadavg()[0])
        print(f"  {name}: {timings[name]}s (min of {REPS})", file=sys.stderr)

    # zero-leak gate (mirrors tools/oracle_sweep.py): after every headline
    # query ran end-to-end with release_all between reps, the session must
    # hold no persisted RDDs — a nonzero residue means some operator pins
    # storage that even release_all cannot see, which at 100 TB is an
    # executor-memory leak, so the headline number would be a lie about
    # steady-state cost.  Fail loudly rather than report a tainted total.
    from tsdisagg_spark.cacheutil import persistent_rdd_ids

    leaked = persistent_rdd_ids(spark)
    if leaked:
        print(f"LEAKED_PERSISTENT_RDDS {leaked}", file=sys.stderr)
        raise SystemExit(f"bench aborted: leaked persistent RDDs {leaked}")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # methodology stamp: round-over-round comparisons are only valid
        # between runs with the same estimator (r2 was single-run, r3+ is
        # min-of-REPS with clearCache between reps — conflating the two
        # overstates speedups)
        "reps": REPS,
        "estimator": "min" if REPS > 1 else "single",
        # host-noise marker (VERDICT r08 #7): the 1/5/15-min load averages
        # at the end of the run, so the judge can separate co-tenant
        # inflation (r08's uniform 1.07-1.09x drift on fixed-overhead
        # sub-second queries) from real plan regressions without
        # cross-referencing stderr.  Load is sampled AFTER the reps, when
        # the bench's own 32 local threads have gone idle-ish; a 1-min
        # value far above the repo's own CPU budget means a noisy host.
        "load": [round(x, 2) for x in os.getloadavg()],
        "load_before": load_before,
        # max 1-min average sampled between queries — includes the
        # bench's own threads, so compare against other runs of the same
        # suite: a watermark far above the usual band means a co-tenant
        # spike hit mid-run even if load_before was quiet
        "load_max": round(load_max, 2),
        # hypervisor steal over the whole run (percent of total CPU
        # jiffies) — the co-tenant signal loadavg cannot separate from
        # the bench's own threads; >1-2% means the numbers are inflated
        "steal_pct": _steal_pct(jiffies_before),
        # core count the session actually ran with (VERDICT r13 #1: the
        # driver benches at two core counts and the artifacts were
        # indistinguishable)
        "cpus": int(CPUS),
        # True when the start load exceeded BENCH_LOAD_GATE even after
        # one decay wait — the total is then an upper bound, not a
        # comparable steady-state number
        "degraded": degraded,
    }

    # regression radar vs the newest committed BENCH_r*.json at the same SF:
    # stderr-only (stdout stays ONE json line for the driver)
    import glob

    prior_files = sorted(glob.glob(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "BENCH_r*.json")))
    if prior_files:
        try:
            with open(prior_files[-1]) as fh:
                # "parsed" can be literal null when the driver's tail
                # capture truncated the JSON head (BENCH_r04) — treat as
                # absent, don't crash the bench on the radar
                prior = json.load(fh).get("parsed") or {}
            if prior.get("sf") == result["sf"]:
                for name, cur in timings.items():
                    old = prior.get("queries", {}).get(name)
                    if old and cur > 1.2 * old:
                        print(
                            f"  REGRESSION {name}: {old}s -> {cur}s "
                            f"({cur / old:.2f}x, vs {os.path.basename(prior_files[-1])})",
                            file=sys.stderr,
                        )
        except (OSError, ValueError):
            pass

    line = json.dumps(result)
    print(line)
    # the driver tail-captures stdout and has truncated the HEAD of long
    # runs' output before (BENCH_r04's `parsed` came back null with the
    # per-query map intact) — mirror the one JSON line to a file so the
    # record survives any stream truncation.  TWO mirrors: the rolling
    # ``bench_out.json`` (latest run) and a per-round
    # ``bench_out_r{NN}.json`` keyed on the registry's DRIVER_ROUND,
    # committed each round so per-query history is BISECTABLE — the r11
    # +31% headline could not be attributed because BENCH_rNN.json keeps
    # only a ~2000-char stdout tail and the rolling mirror was
    # overwritten (VERDICT r11 #1).  Full runs only: a filtered run
    # (BENCH_SKIP/BENCH_ONLY) would overwrite the round's history with a
    # partial map, so it updates the rolling mirror alone.
    here = os.path.dirname(os.path.abspath(__file__))
    targets = [os.path.join(here, "bench_out.json")]
    if not SKIP and not ONLY:
        targets.append(
            os.path.join(here, f"bench_out_r{registry.DRIVER_ROUND:02d}.json")
        )
        # per-core mirror (VERDICT r13 #2): the driver runs the bench at
        # two core counts back to back and both runs mirrored to the SAME
        # files, so the second (low-core) run overwrote the 32-core
        # per-query map and PERF's per-query/scaling blocks came back
        # empty.  A cpus-keyed mirror keeps both maps.
        targets.append(os.path.join(here, f"bench_out_c{int(CPUS)}.json"))
    for path in targets:
        try:
            with open(path, "w") as fh:
                fh.write(line + "\n")
        except OSError:
            pass
    # ... and the mirror protects only the repo's own record: the driver's
    # BENCH_r{N}.json keeps just the last ~2000 chars of stdout, so the full
    # line above loses its head (metric/value) whenever the per-query map is
    # long — BENCH_r04 and BENCH_r06 both came back `parsed: null`.  Emit a
    # compact summary (no per-query map) as the FINAL stdout line so the
    # headline total survives any tail window and parses standalone.
    print(json.dumps({
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "reps": result["reps"],
        "estimator": result["estimator"],
        "n_queries": len(timings),
        "load": result["load"],
        "load_before": result["load_before"],
        "load_max": result["load_max"],
        "steal_pct": result["steal_pct"],
        "cpus": result["cpus"],
        "degraded": degraded,
        "queries_in": f"bench_out.json, bench_out_c{int(CPUS)}.json",
    }))


if __name__ == "__main__":
    main()
