"""Exactly-once resume semantics (SURVEY §5: kill mid-job, rerun,
assert exactly-once output) + the manifest-level compaction
planner."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark import synth
from pdf_ocr_comparison_tool_spark.operators import extraction
from pdf_ocr_comparison_tool_spark.sources import checkpoint as cp
from tests.conftest import SF_DIR


def test_kill_and_resume_exactly_once(spark):
    docs = synth.spans_df(spark, SF_DIR)
    expected = extraction.extract_ordered_spans(docs)
    exp_n = expected.count()
    exp_spans = expected.agg(F.sum(F.size("spans"))).collect()[0][0]

    with tempfile.TemporaryDirectory() as out:
        # first run dies after 3 of 8 parts
        with pytest.raises(RuntimeError, match="simulated failure"):
            cp.run_extraction_job(
                spark, docs, out, run_id="r1", n_parts=8, fail_after_parts=3
            )
        lin1 = cp.committed_parts(spark, out)
        assert lin1.count() == 3

        # resume processes exactly the remaining 5 parts
        done = cp.run_extraction_job(spark, docs, out, run_id="r2", n_parts=8)
        assert done == 5

        # output is exactly-once: same doc set, no duplicates
        got = cp.read_output(spark, out)
        assert got.count() == exp_n
        assert got.select("doc_id").distinct().count() == exp_n
        got_spans = got.agg(F.sum(F.size("spans"))).collect()[0][0]
        assert got_spans == exp_spans

        # lineage totals equal data totals (metrics committed with data)
        lin = cp.committed_parts(spark, out)
        assert lin.count() == 8
        assert lin.agg(F.sum("n_docs")).collect()[0][0] == exp_n
        assert lin.agg(F.sum("n_spans")).collect()[0][0] == exp_spans
        assert set(r["run_id"] for r in lin.collect()) == {"r1", "r2"}

        # idempotence: a third run has nothing to do
        assert cp.run_extraction_job(spark, docs, out, run_id="r3") == 0


def test_part_assignment_stable(spark):
    docs = synth.spans_df(spark, SF_DIR)
    a = docs.select("doc_id", cp.part_col(F.col("doc_id"), 8).alias("p"))
    b = docs.repartition(13).select(
        "doc_id", cp.part_col(F.col("doc_id"), 8).alias("p")
    )
    assert {(r["doc_id"], r["p"]) for r in a.collect()} == {
        (r["doc_id"], r["p"]) for r in b.collect()
    }


def test_training_shard_sink_roundtrip(spark):
    """The shard sink writes Hive-pruned split/source partitions with
    bounded files, and the read-back manifest matches the input
    exactly; a split filter on the read path prunes to the train
    directories only."""
    import tempfile

    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import pipeline
    from pdf_ocr_comparison_tool_spark.sources import training_sink as TS
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    assigned = pipeline.data_split(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    with tempfile.TemporaryDirectory() as tdir:
        out = f"{tdir}/corpus"
        TS.write_training_shards(assigned, out, max_records_per_file=50)
        man = {
            (r["split"], r["source"]): (r["n_docs"], r["n_shards"])
            for r in TS.shard_manifest(spark, out).collect()
        }
        exp = {
            (r["split"], r["source"]): r["n"]
            for r in assigned.groupBy("split", "source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert set(man) == set(exp)
        for k, (n_docs, n_shards) in man.items():
            assert n_docs == exp[k]
            # bounded shards: at least ceil(n/50) files (exact equality
            # only holds when one task writes the whole group —
            # maxRecordsPerFile splits PER TASK, so shuffle-partition /
            # AQE layout changes may spread a group over more files)
            assert n_shards >= (n_docs + 49) // 50
        # the real invariant: no shard file exceeds the record cap
        per_file = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name())
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert per_file <= 50
        dirs = TS.list_partition_dirs(out)
        assert any(d.startswith("split=train/") for d in dirs)
        # partition pruning: a split filter must not scan other splits
        pruned = spark.read.parquet(out).filter(F.col("split") == "train")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(split" in plan
        n_train = pruned.count()
        assert n_train == sum(v for (s, _), (v, _2) in man.items() if s == "train")


def test_corpus_job_kill_rerun_exactly_once(spark):
    """The resumable corpus-build job: a killed first run commits only
    some parts; the rerun completes the rest; the final output equals a
    single uninterrupted run exactly (the global dedup verdict is
    recomputed over the FULL corpus on resume, so cluster keep
    decisions cannot drift), and publishing yields pruned shards."""
    import tempfile

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.sources import checkpoint as cp
    from tests.conftest import SF_DIR_001

    docs = synth.load_table(spark, SF_DIR_001, "documents").repartition(8)

    def rows(out_dir):
        return {
            (r["doc_id"], r["source"], r["split"])
            for r in cp.read_output(spark, out_dir).collect()
        }

    with tempfile.TemporaryDirectory() as tdir:
        clean, resumed = f"{tdir}/clean", f"{tdir}/resumed"
        n = cp.run_corpus_job(spark, docs, clean, run_id="one", n_parts=6)
        assert n == 6
        spark.catalog.clearCache()  # corpus_filter cache contract
        try:
            cp.run_corpus_job(
                spark, docs, resumed, run_id="killed", n_parts=6,
                fail_after_parts=2,
            )
            raise AssertionError("simulated kill did not raise")
        except RuntimeError:
            pass
        spark.catalog.clearCache()
        assert cp.committed_parts(spark, resumed).count() == 2
        n2 = cp.run_corpus_job(spark, docs, resumed, run_id="two", n_parts=6)
        assert n2 == 4
        spark.catalog.clearCache()
        assert rows(clean) == rows(resumed)
        man = cp.publish_training_shards(spark, resumed, f"{tdir}/final")
        got = man.agg({"n_docs": "sum"}).collect()[0][0]
        assert got == len(rows(clean))


def test_corpus_job_racing_writers_fenced(spark):
    """Run fencing: a zombie writer that passed the anti-join before
    the live run committed double-appends lineage rows for the same
    parts. The manifest must resolve to ONE authoritative row per part
    (lowest run_id precedence), the data must stay byte-identical to a
    clean single run, and a subsequent resume must find nothing to do."""
    import tempfile

    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators.pipeline import (
        corpus_filter,
        data_split,
    )
    from pdf_ocr_comparison_tool_spark.sources import checkpoint as cp
    from tests.conftest import SF_DIR_001

    docs = synth.load_table(spark, SF_DIR_001, "documents").repartition(8)
    n_parts = 6

    def rows(out_dir):
        return {
            (r["doc_id"], r["source"], r["split"], r["part"])
            for r in cp.read_output(spark, out_dir).collect()
        }

    with tempfile.TemporaryDirectory() as tdir:
        clean, raced = f"{tdir}/clean", f"{tdir}/raced"
        cp.run_corpus_job(spark, docs, clean, run_id="solo", n_parts=n_parts)
        spark.catalog.clearCache()
        cp.run_corpus_job(spark, docs, raced, run_id="runA", n_parts=n_parts)
        spark.catalog.clearCache()
        # the zombie: replays the job's commit for ALL parts under a
        # later run id — exactly a second writer whose anti-join ran
        # before runA's lineage append
        admitted = (
            docs.select("doc_id", "source", "text")
            .join(corpus_filter(docs).filter(F.col("keep")).select("doc_id"), "doc_id")
            .join(data_split(docs).select("doc_id", "split"), "doc_id")
            .withColumn("part", cp.part_col(F.col("doc_id"), n_parts))
        )
        cp.commit_transformed_parts(
            spark, admitted, list(range(n_parts)), raced, "runB", n_parts
        )
        spark.catalog.clearCache()
        # raw lineage really does hold the double append …
        import os

        raw = spark.read.parquet(os.path.join(raced, "_lineage"))
        assert raw.count() == 2 * n_parts
        # … but the manifest fences to one row per part, first run wins
        man = cp.committed_parts(spark, raced).collect()
        assert len(man) == n_parts
        assert {r["part"] for r in man} == set(range(n_parts))
        assert all(r["run_id"] == "runA" for r in man)
        # data byte-identical to the un-raced run
        assert rows(raced) == rows(clean)
        # resume sees a fully committed job
        n3 = cp.run_corpus_job(spark, docs, raced, run_id="runC", n_parts=n_parts)
        spark.catalog.clearCache()
        assert n3 == 0


def test_corpus_job_partitioning_invariant(spark):
    """The corpus verdict and committed output are pure functions of
    the data — identical under different input partition layouts (the
    cluster-topology independence the checkpoint contract claims)."""
    import tempfile

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.sources import checkpoint as cp
    from tests.conftest import SF_DIR_001

    docs = synth.load_table(spark, SF_DIR_001, "documents")

    def run(layout, out_dir):
        cp.run_corpus_job(spark, layout, out_dir, run_id="x", n_parts=4)
        spark.catalog.clearCache()
        return {
            (r["doc_id"], r["source"], r["split"], r["part"])
            for r in cp.read_output(spark, out_dir).collect()
        }

    with tempfile.TemporaryDirectory() as tdir:
        a = run(docs.repartition(3), f"{tdir}/a")
        b = run(docs.repartition(11).sortWithinPartitions("text"), f"{tdir}/b")
    assert a == b and a


def test_compaction_plan_matches_python_binpack(spark):
    """The planner equals a pure-Python exclusive-prefix-sum bin-pack,
    including an oversized part (own bin, following ids jump); bin
    rollups account for every row."""
    sizes = [(0, 100), (1, 100), (2, 2000), (3, 100), (4, 500), (5, 700)]
    parts = spark.createDataFrame(sizes, "part int, n_spans long")
    target = cp.COMPACT_TARGET_SPANS
    cum = 0
    want = {}
    for part, n in sizes:
        want[part] = cum // target
        cum += n
    rows = cp.compaction_plan(parts).collect()
    assert {r["part"]: r["bin_id"] for r in rows} == want
    assert sum(r["n"] for r in rows) == sum(n for _, n in sizes)
    by_bin: dict[int, list] = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for b, members in by_bin.items():
        assert all(m["bin_parts"] == len(members) for m in members)
        assert all(
            m["bin_rows"] == sum(x["n"] for x in members) for m in members
        )
    # parts within a bin are contiguous in part order
    for b, members in by_bin.items():
        ids = sorted(m["part"] for m in members)
        assert ids == list(range(ids[0], ids[-1] + 1))
