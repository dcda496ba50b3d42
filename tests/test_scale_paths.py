"""Skew salting, multimodal plumbing, streaming windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark import synth
from pdf_ocr_comparison_tool_spark.operators import extraction, multimodal
from pdf_ocr_comparison_tool_spark.plans import skew
from tests.conftest import SF_DIR


def test_salted_repartition_preserves_and_spreads(spark):
    pdf = synth.fixture_docs_pandas(n_docs=120, seed=5)  # has skew docs
    docs = spark.createDataFrame(pdf, schema=synth.FIXTURE_SCHEMA)
    salted = skew.salted_repartition(docs, 8, heavy_threshold=50)
    # row-preserving, column-preserving
    assert salted.count() == docs.count()
    assert salted.columns == docs.columns
    # extraction output identical with/without salting
    a = {r["doc_id"] for r in extraction.extract_ordered_spans(docs).collect()}
    b = {r["doc_id"] for r in extraction.extract_ordered_spans(salted).collect()}
    assert a == b


def test_media_filter_policy_branches(spark):
    """Every policy branch fires on a constructed decoded frame —
    including bad_sample_rate, unreachable from the synthesis spec —
    and precedence is fixed (too_narrow beats extreme_aspect)."""
    from pdf_ocr_comparison_tool_spark.operators import multimodal as M

    rows = [
        # (ref, format, w, h, ch, sr, ns): expected verdicts below
        ("m1", "bmp", 16, 4, 3, 0, 0),      # keep
        ("m2", "bmp", 4, 1, 3, 0, 0),       # too_narrow (beats too_flat)
        ("m3", "bmp", 8, 1, 3, 0, 0),       # too_flat
        ("m4", "bmp", 32, 3, 3, 0, 0),      # extreme_aspect (32 > 8*3)
        ("m5", "wav", 0, 0, 1, M.WAV_SR, 100),   # too_short_audio
        ("m6", "wav", 0, 0, 1, 44100, 1000),     # bad_sample_rate
        ("m7", "wav", 0, 0, 1, M.WAV_SR, 1000),  # keep
    ]
    dec = spark.createDataFrame(
        [("d", *r) for r in rows],
        "doc_id string, media_ref string, format string, width int, "
        "height int, channels int, sample_rate int, n_samples long",
    )
    got = {
        r["media_ref"]: (r["keep"], r["drop_reason"])
        for r in M.media_filter(dec).collect()
    }
    assert got == {
        "m1": (True, None),
        "m2": (False, "too_narrow"),
        "m3": (False, "too_flat"),
        "m4": (False, "extreme_aspect"),
        "m5": (False, "too_short_audio"),
        "m6": (False, "bad_sample_rate"),
        "m7": (True, None),
    }


def test_media_manifest_and_real_decode(spark):
    """Manifest → fetch (Arrow UDF, REAL BMP/WAV container bytes) →
    mapInPandas struct-parse. Decoded header fields must match the
    synthesis spec, content features must match an independent local
    recomputation, and compressed-codec payloads must hit the
    documented NotImplementedError boundary."""
    import hashlib

    import pytest

    docs = synth.spans_df(spark, SF_DIR)
    extracted = extraction.extract_ordered_spans(docs)
    man = multimodal.media_manifest(extracted)
    n_media = man.count()
    assert n_media > 0
    assert man.filter(F.col("media_ref") == "").count() == 0
    rows = multimodal.decode_media(multimodal.fetch_bytes(man)).collect()
    assert len(rows) == n_media
    fmts = {r["format"] for r in rows}
    assert fmts == {"bmp", "wav"}  # both container types exercised
    for r in rows:
        # independent local round trip: synthesize + parse off-Spark
        payload = multimodal.synth_media_payload(r["media_ref"])
        exp = multimodal.parse_media(payload)
        assert r["n_bytes"] == exp["n_bytes"] == len(payload)
        assert (r["width"], r["height"], r["channels"]) == (
            exp["width"], exp["height"], exp["channels"]
        )
        assert (r["sample_rate"], r["n_samples"]) == (
            exp["sample_rate"], exp["n_samples"]
        )
        assert abs(r["mean_level"] - exp["mean_level"]) < 1e-9
        # and the header fields really came from the md5 spec
        hx = hashlib.md5(r["media_ref"].encode()).hexdigest()
        if int(hx[:8], 16) % 2 == 0:
            assert r["format"] == "bmp"
            assert r["width"] == 4 * (1 + int(hx[0:2], 16) % 8)
            assert r["height"] == 1 + int(hx[2:4], 16) % 8
        else:
            assert r["format"] == "wav"
            assert r["n_samples"] == 64 + 4 * int(hx[4:6], 16)
            assert r["sample_rate"] == multimodal.WAV_SR
    # the codec boundary: a JPEG magic is the documented stub
    with pytest.raises(NotImplementedError):
        multimodal.parse_media(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_stateful_running_totals(spark):
    """applyInPandasWithState running totals equal the batch aggregate
    after all micro-batches are processed."""
    import shutil
    import tempfile

    from pdf_ocr_comparison_tool_spark.streaming import stateful, windows as SW

    with tempfile.TemporaryDirectory() as tdir:
        shutil.copy(f"{SF_DIR}/events.parquet", f"{tdir}/events.parquet")
        stream = SW.read_events_stream(spark, tdir)
        out = stateful.running_user_totals(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("running_totals")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # last update per user = final totals
        got = {}
        for r in spark.sql("SELECT * FROM running_totals").collect():
            prev = got.get(r["user_id"])
            if prev is None or r["n_events"] > prev[0]:
                got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 6))
        batch = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        )
        exp = {
            r["user_id"]: (r["n"], round(r["s"], 6)) for r in batch.collect()
        }
        assert got == exp


def test_streaming_windowed_rollup_matches_batch(spark):
    from pdf_ocr_comparison_tool_spark.streaming import windows as SW

    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as tdir:
        # streaming file source needs a directory
        shutil.copy(f"{SF_DIR}/events.parquet", f"{tdir}/events.parquet")
        stream = SW.read_events_stream(spark, tdir)
        out = SW.run_bounded(SW.windowed_rollup(stream), "stream_rollup")
        out = out.localCheckpoint()  # materialize before tmpdir vanishes

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expected = (
        batch.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type", "n", "sum_value",
        )
    )
    got = {(r["w_start"], r["event_type"]): (r["n"], r["sum_value"]) for r in out.collect()}
    exp = {(r["w_start"], r["event_type"]): (r["n"], r["sum_value"]) for r in expected.collect()}
    assert got == exp


def test_streaming_session_windows_match_batch(spark):
    """The streaming session_window twin must agree with the batch
    native-session_window aggregation (whose values are themselves
    driver-oracled via the events_session_window query)."""
    import shutil
    import tempfile

    from pdf_ocr_comparison_tool_spark.streaming import windows as SW

    with tempfile.TemporaryDirectory() as tdir:
        shutil.copy(f"{SF_DIR}/events.parquet", f"{tdir}/events.parquet")
        stream = SW.read_events_stream(spark, tdir)
        out = SW.run_bounded(SW.session_windows(stream), "stream_sessions")
        out = out.localCheckpoint()

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expected = (
        batch.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "user_id",
            "n_events",
        )
    )
    got = {(r["user_id"], r["s_start"]): (r["s_end"], r["n_events"]) for r in out.collect()}
    exp = {(r["user_id"], r["s_start"]): (r["s_end"], r["n_events"]) for r in expected.collect()}
    assert got and got == exp


def test_streaming_first_seen_dedup_matches_batch(spark):
    """The stateful streaming dedup admits exactly the batch keep set
    (min doc_id per content hash) when ingestion order follows doc_id —
    enforced here via file modification times, one file per trigger."""
    import os
    import tempfile

    from pdf_ocr_comparison_tool_spark.operators.features import text_hash
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    rows1 = [(i, f"text {i % 4}") for i in range(1, 9)]       # dupes inside
    rows2 = [(i, f"text {i % 6}") for i in range(9, 17)]      # dupes across
    with tempfile.TemporaryDirectory() as tdir:
        for j, rows in ((1, rows1), (2, rows2)):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.parquet(f"{tdir}/f{j}")
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        out = stateful.streaming_first_seen_dedup(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_dedup")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["text_hash"], r["doc_id"])
            for r in spark.sql("SELECT * FROM stream_dedup").collect()
        }
    batch = (
        spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
        .select("doc_id", text_hash(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    exp = {(r["text_hash"], r["doc_id"]) for r in batch.collect()}
    assert got == exp
    assert len(got) == 6  # 4 hashes from f1 + 2 new in f2


def test_streaming_corpus_filter_matches_batch(spark):
    """The streaming admission twin: per-arriving-doc verdicts from the
    state-store pipeline must equal the batch computation of the same
    reduced spec (corpus_filter precedence minus the batch-only
    near-dup cluster stage) when ingestion order follows doc_id — and
    agree with pipeline.corpus_filter wherever near_dup isn't the
    batch verdict."""
    import os
    import tempfile

    from pdf_ocr_comparison_tool_spark.operators import pipeline, textstats
    from pdf_ocr_comparison_tool_spark.operators.features import text_hash
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps while many other animals of the forest watch it is calm"
    )
    rows1 = [
        (1, good),                      # keep
        (3, "it is"),                   # too_short
        (5, "spam " * 40),              # repetitive_2gram
        (9, "aa bb cc dd ee ff gg hh"), # keep (medium band)
        (10, "aa bb cc dd ee ff gg hh"),  # same-batch exact dup of 9
    ]
    rows2 = [
        (2, good),                      # cross-batch exact dup of 1
        (7, "aa bb cc dd"),             # low_quality (3-4 tokens)
    ]
    with tempfile.TemporaryDirectory() as tdir:
        for j, rows in ((1, rows1), (2, rows2)):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.parquet(f"{tdir}/f{j}")
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        q = (
            stateful.streaming_corpus_filter(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_admit")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["doc_id"]: (r["drop_reason"], r["keep"])
            for r in spark.sql("SELECT * FROM stream_admit").collect()
        }

    docs = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    qe = textstats.quality_exprs(F.col("text"))
    re_ = textstats.repetition_exprs(F.col("text"))
    sig = docs.select(
        "doc_id",
        text_hash(F.col("text")).alias("h"),
        re_["n_tokens"].cast("long").alias("n_tokens"),
        qe["quality"].alias("quality"),
        re_["top_2gram_char_frac"].alias("t2"),
        re_["dup_3gram_frac"].alias("d3"),
    )
    keepers = sig.groupBy("h").agg(F.min("doc_id").alias("kd"))
    reason = (
        F.when(F.col("doc_id") != F.col("kd"), F.lit("exact_dup"))
        .when(F.col("n_tokens") < pipeline.MIN_TOKENS, F.lit("too_short"))
        .when(F.col("quality") == "low", F.lit("low_quality"))
        .when(F.col("t2") > pipeline.MAX_TOP2_FRAC, F.lit("repetitive_2gram"))
        .when(F.col("d3") > pipeline.MAX_DUP3_FRAC, F.lit("repetitive_3gram"))
    )
    exp = {
        r["doc_id"]: (r["dr"], r["keep"])
        for r in sig.join(keepers, "h")
        .select(
            "doc_id", reason.alias("dr"), reason.isNull().alias("keep")
        )
        .collect()
    }
    assert got == exp
    assert got[1] == (None, True)
    assert got[2] == ("exact_dup", False)
    assert got[10] == ("exact_dup", False)  # same-batch dup: min doc_id kept
    assert got[3] == ("too_short", False)
    assert got[7] == ("low_quality", False)
    assert got[5] == ("repetitive_2gram", False)

    # consistency with the full batch operator wherever the excluded
    # near-dup stage isn't the batch verdict
    full = {
        r["doc_id"]: (r["drop_reason"], r["keep"])
        for r in pipeline.corpus_filter(docs).collect()
    }
    spark.catalog.clearCache()
    for d, (dr, keep) in full.items():
        if dr != "near_dup":
            assert got[d] == (dr, keep)


def test_streaming_quality_model_stage_matches_batch(spark):
    """The opt-in model stage: streaming verdicts with
    use_quality_model=True equal batch corpus_filter(quality_model=dim)
    on a fixture with no near-dups (the one batch-only stage)."""
    from pdf_ocr_comparison_tool_spark.operators import pipeline, textstats
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    rows = [
        (1, "spark table query join window stream vector hash merge "
            "column agg sort data scan filter group"),   # model keep
        (2, "slow slow the value small big slow the value small"),  # model drop
        (3, "it is"),                                    # too_short outranks
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as tdir:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{tdir}/f1")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(f"{tdir}/f*")
        )
        q = (
            stateful.streaming_corpus_filter(stream, use_quality_model=True)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_admit_model")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["doc_id"]: r["drop_reason"]
            for r in spark.sql("SELECT * FROM stream_admit_model").collect()
        }
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        r["doc_id"]: r["drop_reason"]
        for r in pipeline.corpus_filter(
            docs, quality_model=textstats.quality_model_dim(spark)
        ).collect()
    }
    assert got == batch
    assert got[2] == "model_low_quality" and got[1] is None
    assert got[3] == "too_short"


def test_streaming_incremental_dedup_matches_batch(spark):
    """The stream-static incremental admission (exact stage) emits the
    batch verdict exactly when ingestion order follows doc_id: copies
    of old-corpus docs → exact_dup naming the old holder; in-stream
    repeats → in_stream_dup (first copy admitted, incl. across
    triggers); novel docs → new."""
    import os
    import tempfile

    from pdf_ocr_comparison_tool_spark.operators.features import text_hash
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    old_rows = [(1, "old text alpha"), (2, "old text beta")]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    rows1 = [
        (10, "old text alpha"),   # exact dup of old 1
        (11, "fresh text one"),   # new
        (12, "fresh text one"),   # in-stream dup of 11
    ]
    rows2 = [
        (13, "fresh text one"),   # in-stream dup ACROSS triggers
        (14, "old text beta"),    # exact dup of old 2
        (15, "fresh text two"),   # new
    ]
    with tempfile.TemporaryDirectory() as tdir:
        for j, rows in ((1, rows1), (2, rows2)):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.parquet(f"{tdir}/f{j}")
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        out = stateful.streaming_incremental_dedup(stream, old)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_inc")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["doc_id"]: (r["status"], r["exact_dup_of"])
            for r in spark.sql("SELECT * FROM stream_inc").collect()
        }
    assert got == {
        10: ("exact_dup", 1),
        11: ("new", None),
        12: ("in_stream_dup", None),
        13: ("in_stream_dup", None),
        14: ("exact_dup", 2),
        15: ("new", None),
    }


def test_streaming_rate_monitor_matches_batch(spark):
    """The online running count equals the batch per-user row_number
    (epoch, event_id order) on every event, across two triggers (state
    carries the base count over the file boundary); over_limit is
    exactly n_so_far > RATE_LIMIT."""
    import os
    import tempfile

    from pyspark.sql import Window

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    events = synth.load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts"
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    with tempfile.TemporaryDirectory() as tdir:
        for j, part in (
            (1, events.filter(F.col("event_id") <= mid)),
            (2, events.filter(F.col("event_id") > mid)),
        ):
            part.coalesce(1).write.parquet(f"{tdir}/f{j}")
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp_ntz"
            )
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        q = (
            stateful.streaming_rate_monitor(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_rate")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["event_id"]: (r["n_so_far"], r["over_limit"])
            for r in spark.sql("SELECT * FROM stream_rate").collect()
        }
    w = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), "event_id"
    )
    exp = {
        r["event_id"]: (r["rn"], r["rn"] > stateful.RATE_LIMIT)
        for r in events.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got and got == exp
    assert any(over for _, over in got.values())  # budget really bites


def test_streaming_event_transitions_match_batch(spark):
    """The streaming Markov-transition twin equals the batch
    event_transitions counts (terminal rows excluded — a stream never
    ends) on the real events table, split across two triggers so
    cross-trigger state must carry each user's last event over the
    file boundary."""
    import os
    import tempfile

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import reports
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    events = synth.load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    with tempfile.TemporaryDirectory() as tdir:
        for j, part in (
            (1, events.filter(F.col("event_id") <= mid)),
            (2, events.filter(F.col("event_id") > mid)),
        ):
            part.coalesce(1).write.parquet(f"{tdir}/f{j}")
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, event_type string, "
                "ts timestamp_ntz"
            )
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        out = stateful.streaming_event_transitions(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_trans")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got: dict[tuple, int] = {}
        for r in spark.sql("SELECT * FROM stream_trans").collect():
            k = (r["from_type"], r["to_type"])
            got[k] = got.get(k, 0) + 1
    exp = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in reports.event_transitions(
            synth.load_table(spark, SF_DIR, "events")
        ).collect()
        if r["to_type"] != reports.TRANSITION_END
    }
    assert got and got == exp


def test_streaming_last_touch_matches_batch_asof(spark):
    """The streaming attribution twin equals the batch as-of join on
    the real events table when ingestion order follows event time
    (two time-split files, one per trigger; cross-trigger state must
    carry the last touch over the file boundary)."""
    import os
    import tempfile

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import temporal
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    events = synth.load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    with tempfile.TemporaryDirectory() as tdir:
        # event_id order IS time order in the generator; split on it
        for j, part in (
            (1, events.filter(F.col("event_id") <= mid)),
            (2, events.filter(F.col("event_id") > mid)),
        ):
            part.coalesce(1).write.parquet(f"{tdir}/f{j}")
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, event_type string, "
                "ts timestamp_ntz, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        out = stateful.streaming_last_touch(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_asof")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["event_id"]: (
                r["click_id"], r["click_epoch"], r["lag_sec"], r["click_value"]
            )
            for r in spark.sql("SELECT * FROM stream_asof").collect()
        }
    exp = {
        r["event_id"]: (
            r["click_id"], r["click_epoch"], r["lag_sec"], r["click_value"]
        )
        for r in temporal.last_touch_attribution(
            synth.load_table(spark, SF_DIR, "events")
        ).collect()
    }
    assert got and got == exp


def test_streaming_bloom_screen_matches_batch(spark):
    """The stream-static Bloom screen (k broadcast membership joins,
    stateless) emits exactly the batch per-gram verdict set on the
    same docs — the streaming-admission twin of bloom_decontaminate."""
    import tempfile

    from pdf_ocr_comparison_tool_spark.operators import dedup
    from pdf_ocr_comparison_tool_spark.streaming import stateful

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                             # long doc: many 8-grams
        (2, base + " extra tail words here"),  # shares grams with 1
        (3, "totally different words " * 4),
        (4, "short"),                          # < n tokens: zero grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # eval set = doc 1's grams (build bits in BATCH, the static side)
    eval_h = dedup._bloom_grams(docs.filter("doc_id = 1")).select("h").distinct()
    bits = dedup.bloom_bits(eval_h).cache()
    batch = {
        (r.doc_id, r.h, r.bloom_hit)
        for r in dedup.bloom_gram_hits(dedup._bloom_grams(docs), bits).collect()
    }
    with tempfile.TemporaryDirectory() as tdir:
        docs.coalesce(1).write.parquet(f"{tdir}/f1")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tdir}/f1")
        )
        out = stateful.streaming_bloom_screen(stream, bits)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_bloom")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.doc_id, r.h, r.bloom_hit)
            for r in spark.sql("SELECT * FROM stream_bloom").collect()
        }
    assert got == batch
    # eval doc's own grams all hit; the disjoint doc has no exact hits
    d1 = [hit for (d, _, hit) in got if d == 1]
    assert d1 and all(d1)
    bits.unpersist()


def test_watermark_drops_late_data_and_finalizes(spark):
    """Watermark semantics pinned end to end (north rule: watermarks +
    windowed aggs for late data): in APPEND mode a window is emitted
    exactly once when the watermark passes its end; an event arriving
    AFTER finalization is dropped — it neither duplicates nor
    resurrects the emitted window — and unfinalized windows are
    withheld. (An event later than the watermark whose window state is
    still live DOES merge in Spark — eviction happens at batch end —
    so the drop is demonstrated one batch after finalization.)"""
    import datetime as dt
    import os
    import tempfile

    from pdf_ocr_comparison_tool_spark.streaming import windows as W

    t0 = dt.datetime(2020, 1, 1, 12, 0, 0)

    def rows(*mins):
        return [
            (i, t0 + dt.timedelta(minutes=m), "u", "click", 1.0)
            for i, m in enumerate(mins)
        ]

    schema = (
        "event_id long, ts timestamp, user_id string, "
        "event_type string, value double"
    )
    with tempfile.TemporaryDirectory() as tdir:
        batches = [
            rows(0, 2, 40),   # two on-time in [12:00, 12:05); 12:40
                              # advances the watermark to 12:30
            rows(35),         # benign: batch runs with wm 12:30 ->
                              # the 12:00 window finalizes (n=2)
            rows(1, 41),      # 12:01 arrives AFTER finalization ->
                              # dropped; 12:41 stays unfinalized
        ]
        for j, rs in enumerate(batches, start=1):
            spark.createDataFrame(rs, schema).coalesce(1).write.parquet(
                f"{tdir}/f{j}"
            )
            for root, _, files in os.walk(f"{tdir}/f{j}"):
                for f in files:
                    os.utime(os.path.join(root, f), (j * 1000, j * 1000))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{tdir}/f*")
        )
        q = (
            W.windowed_rollup(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("wm_late")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = [
            (r.w_start.minute, r.n)
            for r in spark.sql("SELECT * FROM wm_late").collect()
        ]
    # exactly ONE emission of the [12:00, 12:05) window with the two
    # on-time events; the post-finalization 12:01 arrival vanished (no
    # duplicate / no n=3 re-emission); 12:35+ windows withheld
    assert got == [(0, 2)]


def test_media_phash_groups_semantics(spark):
    """aHash bits match the python reference (cell > mean, strict);
    identical signatures group across docs; singletons are excluded."""
    from pdf_ocr_comparison_tool_spark.operators import multimodal

    sig_a = ",".join(str(v) for v in range(16))        # mean 7.5 -> 8 high bits
    sig_b = ",".join(str(15 - v) for v in range(16))   # reversed bits
    rows = [
        ("d1", "m://1/a", "bmp", sig_a, 7.5),
        ("d2", "m://2/a", "bmp", sig_a, 7.5),   # dup of d1's logo
        ("d3", "m://3/a", "bmp", sig_b, 7.5),   # singleton
        ("d4", "m://4/a", "wav", sig_a, 7.5),   # same bits, other format
    ]
    thumbs = spark.createDataFrame(rows, multimodal.THUMB_SCHEMA)
    out = multimodal.media_phash_groups(thumbs).collect()
    assert len(out) == 1
    g = out[0]
    ref_hash = "".join("1" if v > 7.5 else "0" for v in range(16))
    assert (g.format, g.ahash) == ("bmp", ref_hash)
    assert (g.n_media, g.n_docs, g.example_ref) == (2, 2, "m://1/a")


def test_media_phash_pairs_near_dup_detection(spark):
    """A one-bit-flipped thumbnail signature is found as a hamming-1
    pair; a far signature is not; ids are ordered media_refs."""
    from pdf_ocr_comparison_tool_spark.operators import multimodal

    base = list(range(16))                      # bits: 1 iff v > 7.5
    near = list(base)
    near[0] = 8                                 # flips exactly bit 15 (0 -> 1)
    far = [15 - v for v in base]                # complement bits
    rows = [
        ("d1", "m://1/a", "bmp", ",".join(map(str, base)), 7.5),
        ("d2", "m://2/a", "bmp", ",".join(map(str, near)), 7.5),
        ("d3", "m://3/a", "bmp", ",".join(map(str, far)), 7.5),
    ]
    thumbs = spark.createDataFrame(rows, multimodal.THUMB_SCHEMA)
    pairs = multimodal.media_phash_pairs(thumbs).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.a, p.b, p.hamming) == ("m://1/a", "m://2/a", 1)
