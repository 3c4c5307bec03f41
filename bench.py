#!/usr/bin/env python
"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds across the headline queries (each
executed to completion with a cheap count-style action; results are not
collected to the driver).

Median-of-N mode (VERDICT r5 #6 — single contended runs dominated two
rounds of driver artifacts): each query is timed
$SPARK_GRAFT_BENCH_REPS times (default 3) and "queries" carries the
per-query MEDIANS; the raw per-rep timings ride along under
"queries_reps" so contention is visible post-hoc, and "value" is the
sum of medians. Set SPARK_GRAFT_BENCH_REPS=1 for the old single-shot
behavior (used while iterating).
"""

from __future__ import annotations

import json
import os
import sys
import time

from data_engineering_bootcamp_spark.plans.catalog import QUERIES
from data_engineering_bootcamp_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "grouping_sets",
    "rolling_revenue",
    "top_supplier_per_nation",
    "customer_order_spine",
    "part_pair_edges",
    "funnel_conversion",
    "retention_curve",
    "growth_accounting",
    "scd_streaks",
    "datelist_int",
    "array_metrics",
    "sessionization",
    "tumbling_hits",
    "doc_dedup_exact",
    "doc_token_stats",
    "doc_quality",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_cosine_ivf",
    "scd_incremental",
    "order_history",
    "host_activity_reduced",
    "longest_streak",
    "best_stretch",
    "semi_anti_customers",
    "merge_upsert",
    "user_vertices",
    "embedding_neardup",
    "media_features",
    "doc_winnow_fingerprint",
    "skew_salted_agg",
    # round-3 additions: the prefix-filtered exact similarity join is
    # now a scale path (the O(n²) BNLJ form lives on only as the
    # ngram_jaccard_allpairs baseline and stays out of the bench),
    # plus the new sampling/temporal/percentile entries and the
    # composed flagship pipeline
    "ngram_jaccard_pairs",
    "hash_sample_split",
    "asof_latest_order",
    "exact_percentiles",
    "corpus_curation_pipeline",
    "stratified_sample",
    "doc_decontaminate",
    "doc_chunks",
    "pack_token_stream",
    # round-4 additions: cluster-based dedup retention, PII redaction,
    # vocabulary building, and the S8 metadata-scan write path
    "neardup_clusters",
    "doc_pii_redact",
    "vocab_top_tokens",
    "metadata_scan",
    # round-5 addition: real stdlib PNG encode→decode round-trip
    "media_real_decode",
    # round-6 additions: NN resize round-trip, RANGE-interval window,
    # bigram-LM quality scoring
    "media_resize",
    "rolling_time_revenue",
    "doc_bigram_lm_score",
    "semantic_dedup",
    "compaction_rollup",
    "snapshot_cdc_diff",
    # final round-6 additions: C4-style segment removal, KMV sketch
    # set algebra, integer-exact z-score anomaly flags
    "line_dedup_rebuild",
    "kmv_set_ops",
    "zscore_anomaly_days",
    # round-5 additions: reshaping + LLM-pipeline depth (sub-document
    # dedup, source mixing, quantile trimming, int8 quantization)
    "pivot_lang_counts",
    "unpivot_region_metrics",
    "chunk_dedup_rebuild",
    "corpus_mix_plan",
    "quantile_band_filter",
    "embedding_quantize_error",
    "ann_q8_rerank",
    "bpe_merge_candidates",
    "dup_span_extract",
    "tfidf_top_terms",
    "dup_span_removal",
    # round-6 late additions: iterative centrality, one-pass histogram
    # quantiles, contrastive hard negatives
    "pagerank_parts",
    "histogram_quantiles",
    "hard_negative_mining",
    "bloom_prune_stats",
    "distinct_sketch_users",
    "zorder_locality_stats",
    "countmin_token_freq",
    "incremental_agg_merge",
    "last_touch_attribution",
    "orc_roundtrip_rollup",
    "top_event_paths",
    "streaming_countmin",
    # round-6 LATE additions: fuzzy ER, gap interpolation, HLL,
    # interval sweep, perceptual image dedup
    "fuzzy_customer_pairs",
    "interpolate_daily_revenue",
    "hll_user_cardinality",
    "session_concurrency_daily",
    "media_ahash_neardup",
    "media_curation_pipeline",
    # round-12 additions: the approx-envelope twins and the weighted
    # priority sampler
    "table_profile_approx",
    "percentiles_approx",
    "doc_priority_sample",
    # round-13 additions: iterative BPE vocab training and BM25
    # retrieval scoring
    "bpe_train_merges",
    "bpe_encode_corpus",
    "bm25_top_docs",
    "ann_pq_adc",
    # round-14 additions: the IVFADC composition of the IVF and PQ
    # paths, BM25 + ANN reciprocal-rank fusion, byte-level BPE
    "ann_ivfpq",
    "hybrid_rrf_topk",
    "bpe_train_merges_bytes",
    "vocab_coverage_curve",
    # round-15 additions: distributed full-corpus codebook training,
    # the hashed-NB learned quality classifier, and the streaming
    # IVFPQ index maintainer
    "ann_ivfpq_fulltrain",
    "doc_quality_classifier",
    "classifier_pr_eval",
    "streaming_ivfpq_index",
    "unigram_train_vocab",
    "unigram_encode_corpus",
    # round-16 additions: the physical training-shard export, learned
    # language ID + its held-out confusion eval, the NB-gated flagship
    # twin, posting-store compaction, and batched BPE merge rounds
    # (the A side of its A/B — bpe_train_merges — is already above)
    "training_export_rollup",
    "training_export_tokenized",
    "doc_lang_id_learned",
    "lang_id_confusion",
    "corpus_curation_pipeline_learned",
    "ivfpq_index_compact",
    "bpe_train_merges_batched",
    # The three replay entries (pipeline_replay_31d, scd_replay_31d,
    # users_cumulated_replay_31d) are deliberately NOT headlines: their
    # wall time is ~90% driver-side plan composition of 31 sequential
    # daily advances (scale-independent — sf0.1 times within noise of
    # sf0.01; in production each advance is its own job), so they would
    # measure Py4J/Catalyst overhead, not engine throughput. They stay
    # oracle-gated in tools/gate_check.py and the driver's correctness
    # gate every round.
]


def _cpu_marker_mean(samples: int = 3) -> float:
    """Mean wall time of a fixed single-thread workload over N runs."""
    acc = 0.0
    for _ in range(samples):
        t0 = time.perf_counter()
        x = 0
        for i in range(10_000_000):
            x += i
        acc += time.perf_counter() - t0
    return round(acc / samples, 3)


def _cpu_marker_mc_mean(samples: int = 2) -> float:
    """MULTI-core twin of `_cpu_marker_mean` (VERDICT r16 #1): the
    single-thread marker stayed flat (0.42 -> 0.43, 3%) across a round
    whose common-set wall moved ~26%, because the observed drift on
    this box is MULTI-core throughput (cgroup/noisy-neighbor
    contention at full width), which one thread cannot see. This
    marker runs $SPARK_GRAFT_CPUS concurrent sha256 streams — hashlib
    releases the GIL for >2 KiB updates, so plain threads exercise
    every core with zero fork/spawn hazard next to the live Py4J
    gateway — and reports the mean wall time for ALL streams to
    finish. Fixed work per thread (256 x 1 MiB updates), so the
    number scales inversely with the parallel throughput actually
    available to this process during the bench window."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    n = max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    block = b"\x00" * (1 << 20)

    def work(_i: int) -> int:
        h = hashlib.sha256()
        for _ in range(256):
            h.update(block)
        return h.digest()[0]

    acc = 0.0
    with ThreadPoolExecutor(max_workers=n) as pool:
        # warm pass: thread spawn + buffer page-in stay untimed
        list(pool.map(work, range(n)))
        for _ in range(samples):
            t0 = time.perf_counter()
            list(pool.map(work, range(n)))
            acc += time.perf_counter() - t0
    return round(acc / samples, 3)


# The compact stdout line is the driver's ground truth, and its
# recording window is 2000 bytes of TAIL — so the full 112-query map
# (~3.4 KB) cannot print, but everything the line does carry must be
# STABLE: until r16 the printed subset was the ~56 slowest of the day,
# so its composition shifted with host noise every round and the
# driver reported phantom `dropped_from_bench` entries (10 in r16, all
# verifiably still running — VERDICT r16 #1). The printed set is now
# PINNED: the r16-printed 56 names first (a superset guarantee — every
# query the driver saw last round it sees this round), then any
# remaining headline entries in catalog order as the byte budget
# allows. Selection no longer depends on measured times at all.
COMPACT_PRIORITY = [
    "corpus_curation_pipeline_learned",
    "corpus_curation_pipeline",
    "pagerank_parts",
    "training_export_tokenized",
    "streaming_ivfpq_index",
    "media_curation_pipeline",
    "neardup_clusters",
    "streaming_countmin",
    "fuzzy_customer_pairs",
    "metadata_scan",
    "bpe_train_merges_batched",
    "ann_ivfpq_fulltrain",
    "ngram_jaccard_pairs",
    "ann_cosine_lsh",
    "compaction_rollup",
    "unigram_train_vocab",
    "minhash_lsh_pairs",
    "ivfpq_index_compact",
    "bpe_encode_corpus",
    "ann_cosine_ivf",
    "bpe_train_merges",
    "bpe_train_merges_bytes",
    "part_pair_edges",
    "percentiles_approx",
    "media_ahash_neardup",
    "doc_lang_id_learned",
    "ann_pq_adc",
    "simhash_pairs",
    "ann_q8_rerank",
    "lang_id_confusion",
    "ann_ivfpq",
    "unigram_encode_corpus",
    "order_history",
    "table_profile_approx",
    "training_export_rollup",
    "countmin_token_freq",
    "doc_decontaminate",
    "classifier_pr_eval",
    "scd_incremental",
    "dup_span_removal",
    "bloom_prune_stats",
    "kmv_set_ops",
    "doc_quality_classifier",
    "retention_curve",
    "session_concurrency_daily",
    "hybrid_rrf_topk",
    "exact_percentiles",
    "funnel_conversion",
    "dup_span_extract",
    "ann_cosine_topk",
    "scd_streaks",
    "host_activity_reduced",
    "doc_bigram_lm_score",
    "interpolate_daily_revenue",
    "array_metrics",
    "semantic_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # machine-contention marker: loadavg BEFORE the run — a driver bench
    # sharing the box with other work showed 3-5x phantom regressions in
    # round 4, so contaminated runs must be detectable post-hoc
    load_start = os.getloadavg()
    # absolute machine-speed marker: a fixed single-thread workload.
    # Round-over-round per-query drift with IDENTICAL code (r6: 92.9 s
    # idle total, r9: 133.2 s idle total, zero steal, zero plan change)
    # was unfalsifiable because no artifact recorded how fast the box
    # itself was that day; this pins it (observed 0.3-0.7 s). MEAN of
    # 3 samples (not best-of): the marker's job here is to estimate the
    # average contention the queries actually ran under, and a lucky
    # quiet slice would read as an idle box while the queries were
    # contended. Sampled again AFTER the run (below) for the same
    # reason — the combined mean brackets the whole window.
    cpu_marker = _cpu_marker_mean()
    cpu_marker_mc = _cpu_marker_mc_mean()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with the cheapest query so per-query
    # numbers measure execution, not session startup
    QUERIES["pricing_summary"](spark, sf_dir).count()
    # ... and the session's FIRST local-relation build (VERDICT r11 #1):
    # the first createDataFrame pays ~1.9 s of Py4J/serializer init
    # ONCE per session, and that cost lands on whichever headline query
    # first builds a bound-relation (r11: histogram_quantiles rep 1
    # read 3.7 s — isolated it runs 0.95 s; r10's countmin-family
    # neighbors had absorbed it). Session startup, not execution —
    # pre-pay it here.
    spark.createDataFrame([(1,)], "warm int").count()

    from data_engineering_bootcamp_spark.operators.dedup import release_caches

    # Fault isolation: one broken query must never zero the whole perf
    # signal (round 2's bench died at query 15 and emitted nothing).
    # Failures are recorded per-query under "errors" and excluded from
    # the total; the JSON line is ALWAYS printed.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Robustness guard: median-of-3 triples the wall clock, and a run
    # killed by an external timeout emits NO JSON at all (the round-2
    # failure mode). Past the soft budget the remaining queries drop to
    # single-shot — every query still gets timed, the artifact always
    # prints, and "budget_degraded" records which medians were lost.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "900"))
    t_start = time.perf_counter()
    degraded: list[str] = []
    noisy: list[str] = []
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    reps_out: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        per_rep: list[float] = []
        n_reps = reps
        if reps > 1 and time.perf_counter() - t_start > budget:
            n_reps = 1
            degraded.append(name)
        rep_i = 0
        while rep_i < n_reps:
            rep_i += 1
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # force full execution without driver-side collection
                df.write.format("noop").mode("overwrite").save()
                per_rep.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001 — survive any fault
                # record the fault but KEEP any reps that already
                # succeeded — discarding clean timings would make a
                # transient last-rep fault erase the whole signal
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
            finally:
                # dedup operators persist signature blocks for their own
                # multi-join plans; release them so the session stays flat
                try:
                    release_caches()
                except Exception:
                    pass
                # Measurement-hygiene fix (r16, guide §1): collect BOTH
                # runtimes in the untimed gap between reps. Py4j frees
                # JVM-side DataFrame/RDD handles lazily, so checkpoint
                # blocks and shuffle state from rep N survived into rep
                # N+1's timed window and surfaced as 2-5x spikes on the
                # iterative queries (pagerank_parts measured
                # [17.0, 8.7, 10.2, 21.9] s back-to-back vs
                # [7.5, 6.4, 7.3, 6.1] s with this collection — same
                # code). The timed region still contains every cost the
                # query itself incurs, including its own GC pressure;
                # what this removes is CROSS-QUERY contamination, the
                # same class as the pre-paid first-createDataFrame init
                # above. Old artifacts (BENCH_r15/earlier) were measured
                # without it — see OPTIMIZATION_r16.md.
                try:
                    import gc as _gc

                    _gc.collect()
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
            # noise guardrail (VERDICT r9 #5): a >2x spread across reps
            # of identical code means at least one rep was contended
            # (r9 neardup_clusters: [7.3, 15.7, 6.1] moved the headline
            # ~3 s). Buy ONE extra rep so the median has a majority of
            # clean samples, budget permitting.
            if (
                rep_i == n_reps
                and n_reps > 1
                and len(per_rep) >= 2
                and max(per_rep) > 2.0 * min(per_rep)
                and n_reps == reps  # never extend past the soft budget
                and time.perf_counter() - t_start <= budget
            ):
                n_reps += 1
                noisy.append(name)
        if per_rep:
            # median: the robust location for 3 reps on a noisy host —
            # one contended rep can no longer dominate the artifact.
            # LOWER-middle for even counts ONLY when the noise
            # guardrail bought the extra rep (ADVICE r10): there the
            # upper-middle of [a, b, HIGH, HIGH] would hand the
            # headline to a contended sample — the exact outcome the
            # extra rep exists to avoid. For a plainly-configured even
            # rep count (SPARK_GRAFT_BENCH_REPS=2) that rule would
            # silently report the MINIMUM, an optimistic bias, so the
            # true median (mean of the two middles) applies instead.
            srt = sorted(per_rep)
            n = len(srt)
            if n % 2 == 1:
                timings[name] = srt[n // 2]
            elif name in noisy:
                timings[name] = srt[(n - 1) // 2]
            else:
                timings[name] = round((srt[n // 2 - 1] + srt[n // 2]) / 2, 3)
            reps_out[name] = per_rep
            mins[name] = min(per_rep)

    # second marker batch AFTER the run; the combined mean estimates
    # the average host speed across the whole bench window
    cpu_marker = round((cpu_marker + _cpu_marker_mean()) / 2, 3)
    cpu_marker_mc = round((cpu_marker_mc + _cpu_marker_mc_mean()) / 2, 3)
    # host-factor normalization (VERDICT r10 #3): BENCH_r10 on a
    # contended box read as a 16% regression that the idle twin showed
    # was really a 5% improvement. The committed idle-host marker
    # baseline (GATECHECK_times.json, written by --update-times on an
    # idle host) pins how fast the box SHOULD be; the ratio of today's
    # marker to it scales the headline back to idle-host terms. No
    # floor at 1.0 on purpose — a faster-than-baseline box must deflate
    # the normalized number symmetrically or round-over-round
    # comparisons would still drift one-sided. Estimator (ADVICE r11):
    # this marker is a MEAN (it must track average contention), so it
    # divides by the baseline's mean-based twin `cpu_marker_mean` —
    # dividing a mean by gate_check's best-of-3 floor baked a constant
    # ~5% inflation into host_factor and made value_host_normalized
    # read below the raw value even on an idle box. Fallback to the
    # best-of figure only for a pre-r12 baseline file.
    host_factor = None
    host_factor_mc = None
    _base_marker = None
    _base_marker_mc = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "GATECHECK_times.json")) as fh:
            _doc = json.load(fh)
        _base_marker = _doc.get("cpu_marker_mean") or _doc.get("cpu_marker")
        if _base_marker:
            host_factor = round(cpu_marker / _base_marker, 3)
        # multi-core twin (VERDICT r16 #1): the committed baseline is
        # taken by gate_check --update-times on an idle host; the
        # ratio captures the 1.3-1.5x MULTI-core drift the
        # single-thread marker provably misses on this box
        _base_marker_mc = _doc.get("cpu_marker_mc_mean")
        # thread-count guard: the mc marker runs $SPARK_GRAFT_CPUS
        # concurrent streams (fixed work PER THREAD), so its value is
        # only comparable to a baseline taken at the SAME thread
        # count — the driver's lower-core scaling run would otherwise
        # divide an 8-thread marker by a 32-thread baseline and read
        # the box as impossibly fast. A baseline file without the
        # thread count predates this guard and is assumed 32.
        _base_mc_threads = int(_doc.get("cpu_marker_mc_threads") or 32)
        _cur_mc_threads = max(
            1, int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        )
        if _base_marker_mc and _cur_mc_threads == _base_mc_threads:
            host_factor_mc = round(cpu_marker_mc / _base_marker_mc, 3)
    except Exception:
        pass

    total = round(sum(timings.values()), 3)
    # hard error = a query with ZERO successful reps (missing from the
    # total entirely); a transient fault after >= 1 clean rep keeps its
    # median and does not invalidate the headline number
    hard_errors = {k: v for k, v in errors.items() if k not in timings}
    out = {
        "metric": "headline_queries_total_wall_sec",
        # A partial run's sum covers FEWER queries, so publishing it as
        # "value" would make failures look like speedups. When any query
        # has no timing at all, null the headline value and mark the run
        # invalid; the per-query timings that did complete stay
        # available under "queries" and the partial sum under
        # "partial_total_sec".
        "value": total if not hard_errors else None,
        "valid": not hard_errors,
        "unit": "sec",
        "queries": timings,
        # min-of-reps companion (VERDICT r9 #5): medians are the
        # headline, but on a shared box the per-query MIN is the least
        # contended sample — "min_total_sec" is the noise-floor twin of
        # "value", and a round-over-round comparison that disagrees
        # between the two is flagging contention, not code. Like
        # "value", it is NULLED on a partial run (a sum over fewer
        # queries would make failures look like speedups); the partial
        # sum stays available as "partial_min_total_sec".
        "queries_min": mins,
        "min_total_sec": (
            round(sum(mins.values()), 3) if not hard_errors else None
        ),
        # host-normalized twins of "value"/"min_total_sec" (VERDICT
        # r10 #3): wall / host_factor. CONVENTION (made explicit per
        # VERDICT r15): host_factor = today's marker / the committed
        # baseline marker, so dividing converts wall time into
        # BASELINE-HOST seconds — the units of GATECHECK_times.json's
        # host_marker_baseline. A box RUNNING FASTER than that
        # baseline has host_factor < 1 and the normalized value reads
        # ABOVE the raw one (r15: 0.895 -> 128.3 vs 114.8 raw); that
        # is the symmetric counterpart of a contended box deflating
        # (r14: 1.123 -> 97.1 vs 109.1), not an inversion. Normalized
        # totals are comparable ROUND-OVER-ROUND exactly while
        # host_marker_baseline is unchanged; after a rebaseline,
        # compare raw values bracketed by their own markers instead.
        # Null when the run is partial or no baseline exists.
        "host_factor": host_factor,
        # the baseline marker host_factor divided by — recorded so a
        # cross-round reader can tell a true slowdown from a
        # REBASELINED normalization basis (r12 moved to a 1.37x-slower
        # host and rebaselined; without this field the normalized
        # twins would silently stop being comparable across the break)
        "host_marker_baseline": _base_marker,
        "value_host_normalized": (
            round(total / host_factor, 3)
            if host_factor and not hard_errors
            else None
        ),
        "min_total_host_normalized": (
            round(sum(mins.values()) / host_factor, 3)
            if host_factor and not hard_errors
            else None
        ),
        # multi-core host factor (VERDICT r16 #1): host_factor_mc is
        # the marker that actually tracks this box's drift class —
        # prefer it over host_factor when normalizing round-over-round
        "host_factor_mc": host_factor_mc,
        "host_marker_mc_baseline": _base_marker_mc,
        "value_host_normalized_mc": (
            round(total / host_factor_mc, 3)
            if host_factor_mc and not hard_errors
            else None
        ),
        "noisy_entries": noisy,
        "bench_reps": reps,
        "queries_reps": reps_out,
        "budget_degraded": degraded,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # 1/5/15-min loadavg at start and end; compare against
        # $SPARK_GRAFT_CPUS to judge whether the box was idle
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpu_marker_sec": cpu_marker,
        "cpu_marker_mc_sec": cpu_marker_mc,
    }
    if errors:
        out["errors"] = errors
    if hard_errors:
        out["partial_total_sec"] = total
        out["partial_min_total_sec"] = round(sum(mins.values()), 3)
    # Full artifact goes to a FILE; stdout gets a compact line. The
    # driver records only the LAST 2000 bytes of stdout (BENCH_r06/r07
    # both came back "parsed": null because the full dict outgrew that
    # window), so the printed line must stay under ~2000 bytes:
    # headline fields + the PINNED per-query set (COMPACT_PRIORITY;
    # stable across rounds per VERDICT r16 #1), with the remainder
    # counted and the complete set always in the file artifact.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json")
    try:
        with open(full_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        # per-core-count twin (VERDICT r16 #1): the driver's scaling
        # run (lower $SPARK_GRAFT_CPUS) OVERWRITES BENCH_full.json, so
        # the 32-core full artifact was lost every round; the suffixed
        # copy preserves each core count's full per-rep record
        cpus_n = os.environ.get("SPARK_GRAFT_CPUS", "32")
        with open(full_path.replace(".json", f"_c{cpus_n}.json"),
                  "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    except OSError as exc:
        # the full dict carries loadavg / per-rep timings / error
        # messages — losing it silently would defeat contaminated-run
        # detection, so leave a visible trace (ADVICE r8)
        print(f"WARNING: BENCH_full.json write failed ({exc}); "
              "per-rep timings and loadavg lost", file=sys.stderr)
        full_path = None
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "valid": out["valid"],
        "unit": "sec",
        "sf": out["sf"],
        "bench_reps": reps,
        "n_queries": len(timings),
        "full_artifact": "BENCH_full.json" if full_path else None,
        "cpu_marker_sec": cpu_marker,
        "cpu_marker_mc_sec": cpu_marker_mc,
        "min_total_sec": out["min_total_sec"],
        "host_factor": host_factor,
        "host_factor_mc": host_factor_mc,
        "value_host_normalized": out["value_host_normalized"],
        "queries": {},
    }
    if noisy:
        compact["n_noisy"] = len(noisy)
    if hard_errors:
        compact["partial_total_sec"] = total
        compact["n_errors"] = len(hard_errors)
    # a degraded run (single-shot medians past the soft budget) must be
    # distinguishable from a clean one in the recorded stdout, and soft
    # errors (transient fault after >=1 clean rep) counted (ADVICE r8)
    if degraded:
        compact["n_degraded"] = len(degraded)
    if errors:
        compact["n_errors_total"] = len(errors)
    # Line budget: the driver keeps the LAST 2000 bytes of stdout, so
    # the constraint is line length + trailing bytes <= 2000 (bytes
    # BEFORE the line fall off the front harmlessly — r14-r16 lines of
    # ~1950 bytes all parsed). 1920 leaves slack for a stray trailing
    # warning. Selection is PINNED (COMPACT_PRIORITY — see its
    # comment): the r16-printed names always print, then remaining
    # headline entries in catalog order fill the leftover budget, so
    # the printed set is a stable superset round-over-round and the
    # driver's phantom `dropped_from_bench` class is closed.
    budget_bytes = 1920
    compact["queries_omitted"] = len(timings)  # placeholder for sizing
    fixed = len(json.dumps(compact, separators=(",", ":")))
    used = fixed
    pinned = set(COMPACT_PRIORITY)
    order = [n for n in COMPACT_PRIORITY if n in timings] + [
        n for n in HEADLINE if n in timings and n not in pinned
    ]
    for name in order:
        frag = len(json.dumps({name: timings[name]},
                              separators=(",", ":"))) - 1
        if name not in pinned and used + frag > budget_bytes:
            break
        compact["queries"][name] = timings[name]
        used += frag
    compact["queries_omitted"] = len(timings) - len(compact["queries"])
    line = json.dumps(compact, separators=(",", ":"))
    # belt-and-braces: never risk the head of the line leaving the
    # driver's tail window — shed the LOWEST-priority entries first
    # (never the whole map, which would zero the per-query signal)
    while len(line) > 1980 and compact["queries"]:
        compact["queries"].pop(next(reversed(compact["queries"])))
        compact["queries_omitted"] = len(timings) - len(compact["queries"])
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()
    # Always exit 0: the driver records this process's stdout as the
    # round's bench evidence, and a nonzero rc risks the whole JSON
    # being discarded (round 2 lost all numbers to rc=1). Per-query
    # failures are visible in the "errors" field instead.


if __name__ == "__main__":
    sys.exit(main())
