"""Extra benchmarks for optimization work (bench.py is frozen for
measurement — this file hosts the noop-sink isolation runs, repeat
timing, and .explain("formatted") capture used in OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py q1 q2 ...            # time the named queries
  python bench_extra.py --repeats 3 q1 ...   # min of N timed runs
  python bench_extra.py --plans r06 --suffix before q1 ...
      # additionally write plans/<tag>/<q>_<suffix>.txt explains
  python bench_extra.py --all                # whole headline list
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    repeats = 1
    plans_tag = None
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--all":
            names = None; i += 1  # type: ignore[assignment]
        else:
            names.append(a); i += 1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import HEADLINE
    from pdf_ocr_comparison_tool_spark import queries as Q
    from pdf_ocr_comparison_tool_spark.session import get_spark

    if names is None:
        names = list(HEADLINE)

    spark = get_spark(app_name="bench-extra", cores=CPUS)
    qs = Q.queries()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if plans_tag:
            d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", plans_tag)
            os.makedirs(d, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}: warm")
        _noop(qs[name](spark, SF_DIR))
        samples = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            load = round(os.getloadavg()[0], 2)
            spark.sparkContext.setJobDescription(f"{name}: timed")
            t0 = time.perf_counter()
            _noop(qs[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        out[name] = {"min": min(samples), "samples": samples, "load_before": load}
        print(f"{name}: {min(samples):.3f}s  samples={samples} load={load}",
              file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf": SF_DIR, "cores": int(CPUS), "queries": out}))


if __name__ == "__main__":
    main()
