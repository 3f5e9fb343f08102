"""Optimization-round helper: time a subset of catalog queries exactly the
way bench.py does (same session factory, noop sink, clearCache between
passes, median of 3 back-to-back passes), and optionally dump
`.explain("formatted")` to plans/r10/<name>_<tag>.txt.

Usage:
    python scripts/opt_bench.py [--passes N] [--plan-tag before|after] q1 q2 ...

Prints one line per query: name, per-pass seconds, median. A final JSON
line carries {name: median} for scripting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
)


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    plan_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--passes":
            passes = int(args[i + 1])
            i += 2
        elif a == "--plan-tag":
            plan_tag = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    load_all()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session(app_name="opt_profile")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM/codegen warmup

    medians: dict[str, float] = {}
    for name in names:
        if plan_tag:
            import contextlib
            import io

            df = QUERIES[name](spark, SF_DIR)
            os.makedirs(PLAN_DIR, exist_ok=True)
            # public route (ADVICE r10): capture explain() stdout instead
            # of reaching into py4j queryExecution internals
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(PLAN_DIR, f"{name}_{plan_tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
        runs = []
        for it in range(passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"opt:{name}[{it}]")
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = sorted(runs)[len(runs) // 2]
        medians[name] = med
        print(f"{name}: {runs} median={med}", flush=True)
    print(json.dumps(medians))


if __name__ == "__main__":
    main()
