"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "runs": {name: [sec, ...]}, "sf": ...}, then ONE
final compact summary line {"metric": "headline_summary", "total_s",
"min_total_s", "canary_factor", "n_queries", "n_timed", "errors", "sf"}
(VERDICT r8 #2: the full JSON overflows log-tail capture windows; the
last line is always parseable). Each query is forced end-to-end with the
noop sink (full computation, no driver collect bottleneck).

Round-5 methodology changes (VERDICT r4 #3 + ADVICE):
- Each query runs SPARK_GRAFT_RUNS times (default 3); "queries" carries
  the per-query MEDIAN (true median — even run counts average the two
  central runs) and "value" the sum of medians. PERF.md documents
  ±30% single-shot wall jitter on this host — bigger than most real
  deltas — so medians make cross-round per-query comparisons signal.
  The raw singles stay in "runs" so spread remains inspectable.
- Round 8 (VERDICT r7 #4): "queries_min"/"value_min" carry the per-query
  MIN across runs — the cross-round comparison in PERF.md reads min,
  which a single contended outlier run cannot inflate.
- The timer starts BEFORE the query-construction call, so queries that
  run an eager Spark job while building the plan (q_semdedup_bucketed's
  codebook-sizing count) are no longer silently under-reported.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark  # noqa: E402

# Host-contention canaries (VERDICT r6 #6): cheap, map-only, plan-stable
# queries whose true cost cannot drift with algorithm work — any uniform
# movement in them is host state, not code. CANARY_REFS are their
# committed reference medians (idle host, 32 cpus, sf0.1, round 7);
# the bench emits canary_factor = median over canaries of
# (current median / reference median). Cross-round comparisons divide
# totals by it — BENCH_r06 vs r05 carried a uniform ~1.26x contention
# factor that read as a fake regression (PERF.md).
# Round-11 re-baseline (VERDICT r10 #1): the original three canaries
# are 0.2 s map-only queries — they track scheduler/JIT latency but
# not memory-bandwidth or shuffle contention, so BENCH_r10 could read
# "host 15% faster" from the canaries while the heavy shared
# headliners ran 13% slower (the idle A/B rerun showed the heavy
# moves were contention — PERF.md round-11 section). Two mid-weight
# canaries whose resource profile matches the heavy queries were
# added: one shuffle-bound (bigram explode -> groupBy over the
# document corpus: wide exchange, hash agg) and one CPU-bound
# (all-column profiling aggs: whole-stage codegen arithmetic over
# every row, negligible shuffle). All five references are the
# round-11 idle-host medians-of-5 (one measurement epoch — mixing
# the old r7-epoch refs with r11-epoch refs would skew the median);
# pre-r11 canary_factors used the r7 epoch, which this host reads
# ~0.81x of (divide old factors by 0.81 to compare). Every canary
# body is a frozen plan whose true cost cannot drift with algorithm
# work elsewhere.
CANARY_REFS = {
    # map-only latency trio (r7 epoch: 0.23 / 0.214 / 0.275)
    "q_validate_route": 0.171,
    "q_index_name": 0.202,
    "q_daily_counts": 0.209,
    # mid-weight pair, new round 11
    "q_cooccurrence": 0.943,     # shuffle-bound
    "q_profile_columns": 1.649,  # CPU-bound
}
# Reference-epoch id stamped into every bench artifact (VERDICT r11 #2):
# canary_factors are only comparable WITHIN one epoch. Artifacts whose
# canary_epoch differs need the cross-epoch conversion documented in
# PERF.md (r7-epoch factors divide by ~0.81 to land in r11-idle units).
CANARY_EPOCH = "r11-idle"
# A committed bench artifact should be captured at low contention: above
# this canary_factor the per-query numbers carry a uniform host-state
# inflation (BENCH_r11 shipped at 1.433 and read as a fake 32%
# regression until normalized). bench.py warns loudly; the round process
# re-runs idle before committing BENCH_latest.
CANARY_WARN_FACTOR = 1.2

# Headliner set policy (VERDICT r9 #6): HARD CAP at 80 names. Each
# promotion adds at most the tranche's representative shapes (~6-8);
# once adding would cross 80, the same number of OLDEST-PROMOTED,
# timing-stable headliners rotate out (stable = min-timing flat across
# the last three BENCH_r*.json, judged at promotion time), mirroring
# the verdict window's oldest-first rotation. The canaries
# (CANARY_REFS) and the 5-query reference hot path are permanent and
# never rotate. Rationale: the driver's bench budget is ~constant per
# round; unbounded growth (66 -> 74 across r8 -> r9) would crowd out
# the per-query run count that makes medians/mins meaningful.
HEADLINE = (
    # reference hot path
    "q_validate_route",
    "q_index_name",
    "q_daily_counts",
    "q_chunk_count",
    "q_es_actions",
    # relational / analytics
    # (round-11 rotation, per the cap policy above: q_top_orders,
    # q_topk_users, q_keyword_search, q_temperature_mix,
    # q_forecast_revenue, q_sessionize rotated OUT — the six
    # oldest-promoted names whose shapes stay covered: join-topk by
    # q_returned_items, TakeOrdered aggs by q_user_stats/q_retention,
    # term search by q_bm25, weighted mix by q_quantize,
    # tiny-agg regression by q_ewma-family sweeps, gap windows by the
    # incoming q_growth_accounting; all sub-second and unflagged in
    # SWEEP_r10.json)
    "q_pricing_summary",
    "q_revenue_by_nation",
    "q_volume_shipping",
    "q_market_share",
    "q_returned_items",
    "q_user_stats",
    "q_retention",
    # search
    "q_bm25",
    # training-data ops
    "q_wordcount",
    "q_repetition",
    "q_passage_dedup",
    "q_pii_redact",
    "q_boilerplate_strip",
    "q_quantize",
    "q_minhash_dedup",
    "q_dup_clusters",
    "q_dedup_keep_best",
    "q_lsh_eval",
    "q_dup_method_agreement",
    "q_simhash",
    "q_knn_cosine",
    "q_ann_lsh",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_semdedup",
    "q_semdedup_bucketed",
    "q_clean_corpus",
    "q_clean_stream",
    # pipeline ops (round 3)
    # (round-12 rotation, per the cap policy above: q_cdc_latest,
    # q_orphan_check, q_rollup_merge, q_profile_columns_approx rotated
    # OUT — the four oldest-promoted names with flat min-timings across
    # BENCH_r09/r10/r11 (0.26/0.31/0.24 · 0.77/0.79/0.60 ·
    # 0.26/0.31/0.29 · 0.89/0.91/0.91 canary-normalized) whose shapes
    # stay covered: latest-per-key windows by q_crawl_frontier /
    # q_growth_accounting, anti-join audit by q_snapshot_delta /
    # q_bloom_semijoin, rollup aggs by q_pricing_summary, approx-
    # distinct sketches by q_mg_sketch_agreement / q_kmv_overlap; the
    # exact q_profile_columns stays as the permanent CPU canary)
    "q_gopher_filters",
    "q_cooccurrence",
    "q_profile_columns",
    "q_entity_match",
    "q_ann_recall",
    # round-6 headliners: the FAISS-refine ANN leg and the two
    # sample-bounded exact ground-truth audits (VERDICT r5 #2/#3)
    "q_ann_ivfpq_rerank",
    "q_semdedup_sampled",
    "q_embed_near_dup_sampled",
    # round-7 headliners: the promoted curation tranche's representative
    # shapes (fusion, sketch, sort-blocking, span removal, quota, bloom)
    "q_hybrid_rrf",
    "q_heavy_hitters",
    "q_sorted_neighborhood",
    "q_substring_strip",
    "q_domain_cap",
    "q_hist_quantiles",
    "q_bloom_semijoin",
    # round-8 headliners: the promoted corpus tranche's representative
    # shapes (canonical key, weighted top-k, layout audit, hashed linear
    # scoring, banding sweep, KMV sketch pairs, Arrow decode hash, CMS
    # join estimate)
    "q_url_canonical",
    "q_weighted_reservoir",
    "q_layout_skipping",
    "q_linear_quality",
    "q_lsh_tuning",
    "q_kmv_overlap",
    "q_media_phash",
    "q_join_size_est",
    # round-9 headliners: the promoted audit tranche's representative
    # shapes (frontier scheduling window, digest diff join, corpus power
    # laws, distribution divergence, record-linkage block join, decile
    # calibration, chi-square stratification audit, Arrow color rollup)
    "q_crawl_frontier",
    "q_snapshot_delta",
    "q_zipf_fit",
    "q_js_divergence",
    "q_fellegi_sunter",
    "q_score_calibration",
    "q_split_balance",
    "q_media_dominant_color",
    # round-10 headliners: the promoted hygiene tranche's representative
    # shapes (cross-snapshot LSH probe join, sharded sketch merge,
    # gram-position self-repetition window, bounded-histogram threshold
    # sweep, near-dup language-pair rollup, Arrow image-entropy fold) —
    # 74 + 6 = 80, exactly at the cap; the next promotion rotates.
    "q_index_probe_delta",
    "q_mg_sketch_agreement",
    "q_selfrep_spans",
    "q_quality_sweep",
    "q_cross_lang_dup",
    "q_image_entropy",
    # round-11 headliners: the promoted diagnostics tranche's
    # representative shapes (min-band pair attribution + verify join,
    # staged dedup funnel, broadcast-panel hard-negative scan,
    # rule-pair grid rollup, Arrow border-ring decode, user-keyed
    # growth windows) — 74 + 6 = 80 after the six-name rotation above.
    "q_band_yield",
    "q_dedup_cascade",
    "q_hard_negatives",
    "q_filter_overlap",
    "q_image_border_uniformity",
    "q_growth_accounting",
    # round-12 headliners: the promoted ANN-index-internals tranche
    # (IVF occupancy rollup, per-subspace PQ error fold, the multi-
    # probe recall curve with its exact-L2 truth leg, near-dup graph
    # triangle/wedge count) — 76 + 4 = 80 after the four-name rotation
    # above.
    "q_ivf_balance",
    "q_pq_distortion",
    "q_ann_probe_curve",
    "q_dup_transitivity",
)


def _reset_session_state(spark) -> None:
    """Per-run isolation (guide §1.4, r13 measurement fix — disclosed in
    OPTIMIZATION_r13.md): ``clearCache()`` drops catalog-tracked cached
    relations, but ``localCheckpoint()`` blocks (the connected-components
    iterations inside the dedup family) are plain persisted RDDs the SQL
    catalog does not know about. Across 80 queries x 3 runs they pile up
    in the block manager, squeeze the unified memory region, and inflate
    LATE bench entries ~2x vs the same query in a fresh session
    (q_band_yield read 5.7 s at bench position 71 and 1.75 s in a fresh
    subset run of the same commit). Unpersisting them between timed runs
    removes debris from PREVIOUS queries only — each run still computes
    everything from the parquet inputs; nothing is carried forward. The
    gc.collect() drops Python-side plan references so the JVM
    ContextCleaner can release their shuffle state too."""
    import gc

    spark.catalog.clearCache()
    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()
    except Exception:  # noqa: BLE001 — cleanup must never break the bench
        pass
    gc.collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Optional subset override (comma-separated names) for apples-to-apples
    # A/B runs — e.g. re-timing exactly a prior round's query set.
    headline = HEADLINE
    if os.environ.get("SPARK_GRAFT_QUERIES"):
        headline = tuple(os.environ["SPARK_GRAFT_QUERIES"].split(","))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    import __spark_entry__ as entrypoint

    queries = entrypoint.queries()
    # warmup: absorb JVM/codegen/session start cost outside the timings.
    # The minhash warmup runs at the TINY sf (cheap data) purely to
    # compile the large signature-fold expression tree once — codegen is
    # keyed by expression structure, so the sf0.1 run then measures
    # execution, not compilation.
    queries["q_daily_counts"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Warmup sf: the smallest sibling sf* dir next to sf_dir (not a
    # hardcoded path, so non-default layouts still get the codegen warmup).
    parent = os.path.dirname(sf_dir.rstrip("/"))
    sibs = sorted(
        (d for d in os.listdir(parent) if d.startswith("sf")),
        key=lambda d: float(d[2:]) if d[2:].replace(".", "").isdigit() else float("inf"),
    ) if os.path.isdir(parent) else []
    warm_dir = os.path.join(parent, sibs[0]) if sibs else sf_dir
    try:
        queries["q_minhash_dedup"](spark, warm_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001 — warmup must never break the bench
        print(f"warmup skipped ({type(exc).__name__}: {exc})", file=sys.stderr)
    spark.catalog.clearCache()
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "3")))
    timings: dict[str, float | None] = {}
    # per-query MIN across runs (VERDICT r7 #4): the cross-round
    # comparison reads min — a median-of-3 still doubles on one 4x
    # contended outlier run, while min is the least-contended sample
    # and the plan's cost is a lower bound, not a distribution
    mins: dict[str, float | None] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in headline:
        # One broken query must never zero the whole round's numbers:
        # record null + the error and keep going. Caches are cleared
        # between runs so persisted stages from one run can't distort
        # (or subsidize) the next run's timing — each run pays its own
        # full cost, including any eager plan-construction job.
        singles: list[float] = []
        for _ in range(n_runs):
            _reset_session_state(spark)
            try:
                t0 = time.perf_counter()
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                singles.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
        if singles:
            runs[name] = singles
        # An errored query reports null even when earlier runs succeeded
        # (partial singles stay in `runs` for inspection) — cross-round
        # totals must never mix full medians with partial ones.
        if singles and name not in errors:
            # true median (same rule as the canary block below): the
            # naive upper-middle index is the MAX of the two central
            # runs for even n — one contended run then inflates the
            # reported number instead of being damped
            s = sorted(singles)
            mid = len(s) // 2
            timings[name] = (
                s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)
            )
            mins[name] = s[0]
        else:
            timings[name] = None
            mins[name] = None
    total = round(sum(t for t in timings.values() if t is not None), 3)
    # contention normalization: per-canary current/reference ratios,
    # canary_factor = their median (robust to one canary hiccup). 1.0 on
    # an idle host comparable to the reference run; ~1.26x was measured
    # under a day of accumulated Spark sessions (same tree).
    ratios = sorted(
        timings[n] / ref
        for n, ref in CANARY_REFS.items()
        if timings.get(n) is not None
    )
    # true median: with an even count (one canary errored) the naive
    # middle index returns the MAX of two, letting a single inflated
    # canary set the factor instead of being damped
    if not ratios:
        canary_factor = None
    elif len(ratios) % 2:
        canary_factor = round(ratios[len(ratios) // 2], 3)
    else:
        mid = len(ratios) // 2
        canary_factor = round((ratios[mid - 1] + ratios[mid]) / 2, 3)
    # The committed artifact must be self-describing about WHICH tree it
    # measured (round-12 advice: the artifact of record predated the final
    # commit and nothing in the JSON said so). Best-effort — a missing git
    # binary or a non-repo checkout must never break the bench.
    try:
        git_rev = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        git_rev = None
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        **({"git_rev": git_rev} if git_rev else {}),
        "queries": timings,
        "queries_min": mins,
        "value_min": round(
            sum(t for t in mins.values() if t is not None), 3
        ),
        "runs": runs,
        "n_runs": n_runs,
        "canary_factor": canary_factor,
        "canary_epoch": CANARY_EPOCH,
        "canary_refs": CANARY_REFS,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **({"errors": errors} if errors else {}),
    }
    if canary_factor is not None and canary_factor > CANARY_WARN_FACTOR:
        payload["canary_contended"] = True
        print(
            f"WARNING: canary_factor {canary_factor} > {CANARY_WARN_FACTOR} — "
            "host is contended; per-query numbers carry a uniform "
            "inflation. Re-run idle before committing this artifact.",
            file=sys.stderr,
        )
    print(json.dumps(payload))
    # VERDICT r10 #3: the driver's BENCH_rN.json keeps only a stdout
    # TAIL, so ~half the per-query medians were unrecoverable each
    # round. Persist the full per-query table as a side artifact
    # (the SPARK_GRAFT_SWEEP_OUT pattern from examples/scale_sweep.py);
    # BENCH_latest.json is committed per round so cross-round per-query
    # comparisons cover 80/80. A SUBSET run (SPARK_GRAFT_QUERIES) never
    # writes the committed default path — a one-query A/B spot-check
    # must not clobber the round's full 80-query record (round-11
    # review); point SPARK_GRAFT_BENCH_OUT somewhere to keep subset
    # artifacts.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None and headline == HEADLINE:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_latest.json"
        )
    if out_path:
        try:
            with open(out_path, "w") as fh:
                json.dump(payload, fh, indent=1)
                fh.write("\n")
        except OSError as exc:
            print(f"side artifact not written ({exc})", file=sys.stderr)
    # VERDICT r12 #1/#3: the driver keeps only a ~2000-char stdout TAIL,
    # and the big payload above is the huge FIRST line — so the driver's
    # per-query comparison channel (PERF_rN.json) came back empty
    # (n_common: 0) even though both bench runs succeeded. Emit ONE
    # compact per-query-MIN line (2-decimal values, ~1.3 KB for 80
    # queries) immediately before the final summary so the tail window
    # always carries the per-query ground truth.
    print(
        json.dumps(
            {
                "metric": "per_query_min",
                "queries": {
                    n: (round(v, 2) if v is not None else None)
                    for n, v in mins.items()
                },
                "canary_factor": canary_factor,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )
    )
    # VERDICT r8 #2: the big JSON above can overflow a log-tail capture
    # window (BENCH_r08's driver artifact kept only the last ~44 per-query
    # entries and parsed as null). Emit ONE final compact line so ANY
    # tail window ends with a machine-parseable summary record.
    print(
        json.dumps(
            {
                "metric": "headline_summary",
                **({"git_rev": git_rev} if git_rev else {}),
                "total_s": total,
                "min_total_s": round(
                    sum(t for t in mins.values() if t is not None), 3
                ),
                "canary_factor": canary_factor,
                "canary_epoch": CANARY_EPOCH,
                # the contended flag must survive a tail-only capture —
                # this compact line is exactly the record that remains
                # when the big payload overflows the window
                **(
                    {"canary_contended": True}
                    if payload.get("canary_contended")
                    else {}
                ),
                "n_queries": len(headline),
                "n_timed": sum(1 for t in timings.values() if t is not None),
                "errors": sorted(errors),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
