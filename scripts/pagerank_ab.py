"""PageRank lineage-regime variance A/B (r7 verdict task #5).

The r7 judge measured pagerank at 9.0 s median with a 6.2-9.5 s spread
(r6: 6.1 s) — high run-to-run variance under the current per-iteration
lazy-localCheckpoint regime. This probe times each regime N times
back-to-back on the SAME session (noop sink, cache cleared per run, same
protocol as bench.py) and prints median + spread, so the flatter regime
can be picked on evidence:

- lazy  : ranks.localCheckpoint(eager=False) per iteration (production
          until r8; the A/B below flipped production to eager)
- eager : ranks.localCheckpoint(eager=True) per iteration — PRODUCTION
          since r8 (flatter AND faster at sf0.1 and ×30; README row)
- none  : no per-iteration cut (5-iteration lineage, AQE stage reuse)

Usage: python scripts/pagerank_ab.py [sf_dir] [runs_per_regime]
Run on a QUIET machine — contended timings reversed a persist conclusion
once (COVERAGE r7 notes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_spark.plans.queries_graph import _pagerank_impl
from hadoop_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    spark = get_session(app_name="pagerank_ab")
    # one untimed warm-up so JVM/codegen startup isn't billed to the
    # first regime's first run
    _pagerank_impl(spark, SF_DIR, lineage="lazy").write.format("noop").mode(
        "overwrite"
    ).save()
    results: dict[str, list[float]] = {}
    for regime in ("lazy", "eager", "none"):
        runs: list[float] = []
        for it in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            df = _pagerank_impl(spark, SF_DIR, lineage=regime)
            df.write.format("noop").mode("overwrite").save()
            took = round(time.time() - t0, 3)
            runs.append(took)
            print(f"# {regime}[{it}]: {took}s", file=sys.stderr)
        results[regime] = runs
    print(f"{'regime':8s} {'median':>8s} {'min':>8s} {'max':>8s} {'spread':>7s}")
    for regime, runs in results.items():
        s = sorted(runs)
        med = s[len(s) // 2]
        print(
            f"{regime:8s} {med:8.2f} {s[0]:8.2f} {s[-1]:8.2f} "
            f"{s[-1] / s[0]:6.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
