"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

Modes:
  python bench.py                 # headline run → one JSON line
  python bench.py --scaling       # same job at local[8] and local[32],
                                  # report throughput + scaling efficiency
                                  # (north-rule two-cluster-size evidence)
  python bench.py --child N       # internal: one timed run at local[N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Queries included in the headline benchmark (grow as operators land).
HEADLINE = [
    "extract_spans",
    "extract_fulltext",
    "span_stats",
    "match_best",
    "match_merged",
    "classify_pages",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "events_sessions",
    "lineitem_rollup",
]


def _run_headline(cores: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdf_ocr_comparison_tool_spark import queries as Q
    from pdf_ocr_comparison_tool_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cores)
    qs = Q.queries()
    # warm the JVM + parquet footer cache once with a trivial action
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        qs[name](spark, SF_DIR).count()  # warm: codegen + JIT, amortized at scale
        t0 = time.perf_counter()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "cores": int(cores),
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "total_sec": total,
        "queries": timings,
        "rows": rows,
        "extract_docs_per_sec": round(n_docs / timings["extract_spans"], 1)
        if timings.get("extract_spans")
        else None,
    }


def main() -> None:
    if "--child" in sys.argv:
        cores = sys.argv[sys.argv.index("--child") + 1]
        os.environ["SPARK_GRAFT_CPUS"] = cores
        print("CHILD_JSON:" + json.dumps(_run_headline(cores)))
        return

    if "--scaling" in sys.argv:
        results = {}
        for cores in ("8", "32"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", cores],
                capture_output=True, text=True, timeout=3600,
                env={**os.environ, "SPARK_GRAFT_CPUS": cores},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("CHILD_JSON:")]
            if not line:
                sys.stderr.write(out.stdout + "\n" + out.stderr + "\n")
                raise SystemExit(f"child local[{cores}] failed")
            results[cores] = json.loads(line[0][len("CHILD_JSON:"):])
        thr8 = results["8"]["n_docs"] / results["8"]["total_sec"]
        thr32 = results["32"]["n_docs"] / results["32"]["total_sec"]
        eff = (thr32 / thr8) / 4.0
        print(json.dumps({
            "metric": "scaling efficiency local[8]→local[32] (N vs 4N)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "sf": SF_DIR,
            "throughput_docs_per_sec": {"local8": round(thr8, 1), "local32": round(thr32, 1)},
            "detail": results,
        }))
        return

    r = _run_headline(CPUS)
    print(json.dumps({
        "metric": "headline query wall time",
        "value": r["total_sec"],
        "unit": "sec",
        "queries": r["queries"],
        "sf": SF_DIR,
        "cores": r["cores"],
        "n_docs": r["n_docs"],
        "extract_docs_per_sec": r["extract_docs_per_sec"],
    }))


if __name__ == "__main__":
    main()
