#!/usr/bin/env python
"""One-off perf measurement of the catalog entries bench.py OMITS
(VERDICT r12 #7: 30+ entries never appear in HEADLINE, so their sf0.1
wall time was never committed; the sf0.01 gate times them every round,
but scale behavior was unmeasured).

Methodology matches bench.py exactly — median of 3 noop-write
executions per entry on the shared session, cpu marker + loadavg
bracketing so a contended run is detectable post-hoc — over
`set(QUERIES) - set(HEADLINE)`. Three entry classes get a `class`
annotation in the artifact so the numbers are read correctly:

  - "replay":    the 31-day composed replays — wall is ~90%% driver-side
                 plan composition (documented in bench.py's HEADLINE
                 comment), measured here anyway so the number exists.
  - "allpairs":  deliberately-quadratic baselines kept out of HEADLINE
                 because their cost IS the point of their twin entry.
  - "batch"/"streaming"/"write": everything else, by surface.

Usage: python tools/bench_tail.py [sf_dir] [--out=PATH]
Writes BENCH_tail_r13.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — reuse HEADLINE + the cpu marker
from data_engineering_bootcamp_spark.plans.catalog import QUERIES  # noqa: E402
from data_engineering_bootcamp_spark.session import get_spark  # noqa: E402

REPLAYS = {"pipeline_replay_31d", "scd_replay_31d", "users_cumulated_replay_31d"}
ALLPAIRS = {"embedding_neardup_allpairs", "ngram_jaccard_allpairs"}


def _klass(name: str) -> str:
    if name in REPLAYS:
        return "replay"
    if name in ALLPAIRS:
        return "allpairs"
    if name.startswith("streaming_"):
        return "streaming"
    if name.endswith("_rollup") or name in {"metadata_scan", "insert_select_rollup"}:
        return "write"
    return "batch"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_tail_r13.json",
    )
    for f in sys.argv[1:]:
        if f.startswith("--out="):
            out_path = f.split("=", 1)[1]
    tail = [q for q in QUERIES if q not in set(bench.HEADLINE)]
    load_start = os.getloadavg()
    cpu_marker = bench._cpu_marker_mean()
    spark = get_spark(app_name="bench-tail")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["pricing_summary"](spark, sf_dir).count()
    spark.createDataFrame([(1,)], "warm int").count()
    from data_engineering_bootcamp_spark.operators.dedup import release_caches

    timings: dict[str, float] = {}
    reps_out: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in tail:
        per_rep: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                per_rep.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001 — fault isolation
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
            finally:
                try:
                    release_caches()
                except Exception:
                    pass
        # an entry that errored mid-run records ONLY under errors —
        # a median of 1-2 surviving reps must not read as a 3-rep median
        if per_rep and name not in errors:
            timings[name] = round(statistics.median(per_rep), 3)
            reps_out[name] = per_rep
        print(f"{name:34s} {timings.get(name, float('nan')):7.3f}s "
              f"{per_rep}", flush=True)
    doc = {
        "metric": "tail_queries_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "n_queries": len(timings),
        "bench_reps": 3,
        "cpu_marker_sec": cpu_marker,
        "loadavg_start": list(load_start),
        "loadavg_end": list(os.getloadavg()),
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "queries_reps": reps_out,
        "classes": {n: _klass(n) for n in timings},
        "errors": errors,
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}: total {doc['value']} s over {len(timings)}")
    return 0 if not errors else 1


if __name__ == "__main__":
    raise SystemExit(main())
