"""Synthetic CPU load for the bench contention experiment.

Spawns N busy-loop processes (default: 2x the visible CPUs, i.e. full
oversubscription — the regime where every runnable thread, including
Spark's task threads AND bench.py's single-thread cpu marker, gets the
same fair-share slowdown) until killed. Used to produce the "loaded"
half of BENCH_contention_r{N}.json (VERDICT r10 #3): run bench.py
once idle and once under this load at the same HEAD and compare the
host_factor-normalized headlines.

    python tools/load_gen.py [n_procs] &
    LOAD_PID=$!; ... ; kill $LOAD_PID

Partial contention (e.g. N = half the CPUs) is deliberately NOT the
target regime: there the marker thread can still find a free core and
reads ~idle speed while wide stages are starved, so no single scalar
can reconcile the two — the artifact documents the oversubscribed
case, which is what a shared driver box actually looks like.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import signal
import sys


def _spin() -> None:  # pragma: no cover - infinite by design
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))
    x = 0
    while True:
        x = (x + 1) & 0xFFFFFF


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * (os.cpu_count() or 8)
    procs = [mp.Process(target=_spin, daemon=True) for _ in range(n)]
    for p in procs:
        p.start()
    print(f"load_gen: {n} busy processes (pid {os.getpid()}); kill to stop",
          flush=True)
    try:
        signal.pause()
    except KeyboardInterrupt:
        pass
    finally:
        for p in procs:
            p.terminate()


if __name__ == "__main__":
    main()
