"""Balanced ABBA A/B for the r11 wedge_closure kernel: variant A = kernel
(normal cap), variant B = inherited JVM wedge self-join (cap forced to 0
so wedge_closure declines). One session, alternating AB/BA pairs, noop
sink, clearCache between passes, outputs compared exactly once per query.

Usage: python scripts/wedge_ab.py [n_pairs] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import hadoop_spark.operators.graph as graph_mod
from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r11")

REAL_CAP = graph_mod._WEDGE_KERNEL_MAX_EDGES


def main() -> None:
    args = sys.argv[1:]
    n_pairs = int(args[0]) if args and args[0].isdigit() else 3
    names = [a for a in args if not a.isdigit()] or [
        "triangle_count",
        "clustering_coefficient",
        "link_prediction_cn",
    ]
    load_all()
    spark = get_session(app_name="wedge_ab")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(name: str, variant: str) -> float:
        graph_mod._WEDGE_KERNEL_MAX_EDGES = REAL_CAP if variant == "A" else 0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"wedge_ab:{name}:{variant}")
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        took = round(time.time() - t0, 3)
        print(f"# {name} {variant}: {took}s loadavg={os.getloadavg()[0]:.1f}", flush=True)
        return took

    def dump_plan(name: str, variant: str, tag: str) -> None:
        graph_mod._WEDGE_KERNEL_MAX_EDGES = REAL_CAP if variant == "A" else 0
        spark.catalog.clearCache()
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        os.makedirs(PLAN_DIR, exist_ok=True)
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())

    def rows(name: str, variant: str):
        graph_mod._WEDGE_KERNEL_MAX_EDGES = REAL_CAP if variant == "A" else 0
        spark.catalog.clearCache()
        return sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))

    out: dict[str, dict] = {}
    for name in names:
        assert rows(name, "A") == rows(name, "B"), f"{name}: output mismatch"
        print(f"# {name}: outputs identical across variants", flush=True)
        dump_plan(name, "B", "before")
        dump_plan(name, "A", "after")
        a_runs, b_runs = [], []
        for p in range(n_pairs):
            order = ["A", "B"] if p % 2 == 0 else ["B", "A"]
            for v in order:
                (a_runs if v == "A" else b_runs).append(run(name, v))
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        out[name] = {
            "A_kernel": a_runs,
            "B_inherited": b_runs,
            "A_med": med(a_runs),
            "B_med": med(b_runs),
            "A_min": min(a_runs),
            "B_min": min(b_runs),
        }
    graph_mod._WEDGE_KERNEL_MAX_EDGES = REAL_CAP
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
