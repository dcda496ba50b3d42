"""Training-data shard sink — the write side of the corpus pipeline.

A training run wants its admitted corpus laid out as (a) Hive-style
split/source partitions so a sampler can prune to `split=train/` at
scan time, and (b) bounded shard files so no reader task ever owns a
multi-GB file. Both are native Spark writer features — this module
just fixes the contract and returns a verifiable manifest:

* ``partitionBy("split", "source")`` → directory pruning for free
  (the sampler's `WHERE split = 'train'` never touches valid/test
  files — the same partition-pruning story as the scan side);
* ``maxRecordsPerFile`` → bounded shards; at 100 TB the same setting
  yields tens of thousands of uniform files instead of a few
  monsters, which is exactly what a data-loader fleet wants;
* the returned manifest (one row per written partition: doc count,
  shard-file count) is the audit table a pipeline commits next to the
  data — the training-side analogue of checkpoint.py's lineage rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_MAX_RECORDS = 10_000


def write_training_shards(
    assigned: DataFrame,
    path: str,
    max_records_per_file: int = SHARD_MAX_RECORDS,
) -> None:
    """Write a frame carrying (split, source, ...) columns as pruned,
    bounded parquet shards under ``path``."""
    (
        assigned.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("split", "source")
        .parquet(path)
    )


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """One row per (split, source) partition actually on disk: doc
    count and shard-file count — read back from the written data plus
    the input_file_name of every row, so the manifest can only state
    what is really there."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    return df.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_f").alias("n_shards"),
    )


def list_partition_dirs(path: str) -> list[str]:
    """Relative `split=?/source=?` directories present under path."""
    out = []
    for split_dir in sorted(os.listdir(path)):
        if not split_dir.startswith("split="):
            continue
        for src_dir in sorted(os.listdir(os.path.join(path, split_dir))):
            if src_dir.startswith("source="):
                out.append(f"{split_dir}/{src_dir}")
    return out
