"""spark-submit entry point for the extraction job (north rule: ships
via ``spark-submit --py-files`` to a multi-executor cluster).

    spark-submit --py-files pdf_ocr_comparison_tool_spark.zip \
        -m pdf_ocr_comparison_tool_spark.pipeline -- \
        --input /path/sfX --output /path/out --run-id r1 [--n-parts 256]

Resumable: re-running with the same ``--output`` processes only parts
missing from the lineage manifest (exactly-once per part).
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid

from pyspark.sql import functions as F

from . import synth
from .plans.skew import salted_repartition
from .session import get_spark
from .sources import checkpoint as cp


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="sf dir with documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default=None)
    p.add_argument("--n-parts", type=int, default=64)
    p.add_argument("--cores", default=None)
    p.add_argument(
        "--job",
        choices=("extract", "corpus"),
        default="extract",
        help="extract = spans pipeline; corpus = admission filter + split "
        "(+ --publish for the final shard layout)",
    )
    p.add_argument(
        "--publish",
        default=None,
        help="corpus only: after all parts commit, re-lay the output as "
        "split/source training shards at this path",
    )
    args = p.parse_args(argv)

    spark = get_spark(app_name=f"{args.job}-job", cores=args.cores)
    run_id = args.run_id or uuid.uuid4().hex[:12]

    if args.job == "extract":
        docs = salted_repartition(
            synth.spans_df(spark, args.input),
            int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
        done = cp.run_extraction_job(
            spark, docs, args.output, run_id=run_id, n_parts=args.n_parts
        )
    else:
        docs = synth.load_table(spark, args.input, "documents").repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
        done = cp.run_corpus_job(
            spark, docs, args.output, run_id=run_id, n_parts=args.n_parts
        )
    lineage = cp.committed_parts(spark, args.output)
    stats = lineage.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_spans").alias("spans")
    ).collect()[0]
    result = {
        "job": args.job,
        "run_id": run_id,
        "parts_processed": done,
        "total_docs": stats["docs"],
        "total_spans": stats["spans"],
    }
    if args.job == "corpus" and args.publish:
        man = cp.publish_training_shards(spark, args.output, args.publish)
        result["published_partitions"] = man.count()
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
