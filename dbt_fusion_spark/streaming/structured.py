"""Structured Streaming analogs of the reference's streaming-shaped
declarations (SURVEY §2.9).

The reference executes no streams itself; it *declares*:
- Databricks `streaming_table`
  (crates/dbt-adapter/src/relation/databricks/configs/streaming_table.rs:16)
- Snowflake `dynamic_table` with target_lag / refresh_mode / initialize
  (crates/dbt-adapter/src/relation/snowflake/dynamic_table.rs:141,215,285)
- microbatch incremental models (model_config.rs:79-82)

Here they become real Spark Structured Streaming pipelines:
- streaming_table  -> readStream → transform → writeStream.toTable
- dynamic_table    -> the same with trigger(processingTime=target_lag);
                      refresh_mode full ≈ complete mode, incremental ≈
                      append/update
- microbatch       -> trigger(availableNow=True) backfill — each micro-
                      batch lands idempotently, then the query stops
- late data        -> withWatermark(event_time, lookback)

Scale notes: state lives in the checkpoint (RocksDB on real clusters);
watermarks bound it. foreachBatch + MERGE gives exactly-once upserts —
the streaming twin of the incremental merge strategy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def streaming_table(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_table: str,
    checkpoint: str,
    trigger: dict | None = None,
    output_mode: str = "append",
) -> StreamingQuery:
    """streaming_table materialization: continuous readStream →
    transform → writeStream.toTable."""
    out = transform(source)
    writer = (
        out.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.toTable(target_table)


def dynamic_table(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_table: str,
    checkpoint: str,
    target_lag: str = "60 seconds",
    refresh_mode: str = "incremental",
) -> StreamingQuery:
    """dynamic_table(target_lag, refresh_mode): refresh cadence maps to
    a processingTime trigger; 'full' refresh ≈ complete output of an
    aggregate, 'incremental' ≈ append."""
    mode = "complete" if refresh_mode == "full" else "append"
    return streaming_table(
        source, transform, target_table, checkpoint,
        trigger={"processingTime": target_lag}, output_mode=mode,
    )


def windowed_aggregate(
    events: DataFrame,
    event_time: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregate with late-data watermark — the
    streaming twin of the microbatch day-partition rollup. The
    `lookback` config of microbatch models is exactly this watermark."""
    keys = keys or ["event_type"]
    return (
        events.withWatermark(event_time, watermark)
        .groupBy(F.window(F.col(event_time), window_size).alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys, "n_events", "total_value",
        )
    )


def streaming_merge(
    source: DataFrame,
    target_table: str,
    unique_key: str | list[str],
    checkpoint: str,
    spark: SparkSession,
    trigger: dict | None = None,
    partition_by: str | list[str] | None = None,
) -> StreamingQuery:
    """Exactly-once streaming upsert: foreachBatch + the engine's merge
    executor per micro-batch (checkpoint makes batch ids replay-safe,
    merge makes the replay idempotent).

    Each batch routes through materialize_incremental, so it gets the
    same cost ladder as batch merges (r4): native MERGE INTO on
    Delta/Iceberg, the partition-scoped overwrite when `partition_by`
    ⊆ unique_key (O(touched partitions) per micro-batch — pass a time
    partition for the classic streaming-upsert shape), and the atomic
    swap rewrite as the last resort. A micro-batch rewriting the whole
    target per trigger is the streaming version of the r3
    scale-killer; the partition-scoped path is what makes a continuous
    upsert viable at 100 TB."""
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
    )

    schema, _, name = target_table.rpartition(".")
    schema = schema or "default"

    def upsert(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch hands a frame bound to a per-batch CLONE of the
        # session; the view and the executor must use that clone or the
        # view is invisible to the merge SQL.
        bspark = batch.sparkSession
        adapter = SparkAdapter(spark=bspark, default_schema=schema)
        view = f"__stream_batch_{name}"
        batch.createOrReplaceTempView(view)
        materialize_incremental(
            adapter, schema, name, f"SELECT * FROM {view}",
            strategy="merge", unique_key=unique_key,
            partition_by=partition_by)
        # the overwrite ran in the clone; drop stale file listings so
        # readers in any session of this app see the new files
        spark.catalog.refreshTable(target_table)

    # update mode: each micro-batch delivers changed rows only — the
    # merge makes applying them idempotent (aggregations without
    # watermark are not allowed in append mode).
    writer = (
        source.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def streaming_ann_ingest(
    source: DataFrame,
    codes_table: str,
    checkpoint: str,
    spark: SparkSession,
    trigger: dict | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
    compact_max_files: int = 16,
) -> StreamingQuery:
    """Continuous ANN index maintenance: each micro-batch of new
    embeddings is PQ-encoded with the existing build_ivf_pq_index
    artifact's quantizers and appended to its codes table — the
    streaming twin of build_ivf_pq_index(mode='append') (r7), i.e. the
    live half of the 100 TB serving shape: the index artifact stays
    current as the crawl lands, queries keep reading m-byte codes, and
    the corpus floats are touched exactly once per vector, at ingest.

    Exactly-once: the checkpoint replays failed batches, and an
    append is made idempotent by anti-joining the batch's ids against
    the codes table before encoding (the codes scan reads only the id
    column of the m-byte table). Quantizer drift is rejected by the
    append path itself; watch ivf_index_health's mean_batch_dist2 to
    decide when to stop appending and rebuild
    (similarity.rebuild_ivf_pq_index).

    `compact_every=N` (r8): every N-th micro-batch also runs
    compact_ivf_codes over the artifact — each append lands one file
    set per touched cell, so at crawl cadence the cell partitions
    otherwise accumulate thousands of tiny files and the probe scan
    degrades to file-open overhead. Compaction rewrites only cells
    holding more than `compact_max_files` files; serving is
    bit-identical before/after."""
    from dbt_fusion_spark.llm.similarity import (
        build_ivf_pq_index,
        compact_ivf_codes,
        load_ivf_pq_index,
    )

    def ingest(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        codes, cents, books = load_ivf_pq_index(bspark, codes_table)
        new = (batch.select(id_col, vec_col)
               .dropDuplicates([id_col])
               .join(codes.select(id_col), id_col, "left_anti"))
        if not new.isEmpty():
            build_ivf_pq_index(new, cents, books, codes_table,
                               id_col=id_col, vec_col=vec_col,
                               mode="append")
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_ivf_codes(bspark, codes_table,
                              max_files=compact_max_files)

    writer = (
        source.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stateful_sessionize(
    source: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    timeout_flush: bool = False,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (the escape hatch for semantics Spark's built-in windows can't
    express): per-key sessionization with explicit GroupState.

    State per user: (session_start_ns, last_seen_ns, n_events) — epoch
    NANOSECOND longs, never floats: ~1.7e18 ns exceeds a double's
    53-bit mantissa, and a float round-trip leaves sub-microsecond
    remainders Arrow's safe timestamp cast rejects. A session
    closes when a new event arrives more than gap_seconds after
    last_seen (emitted in that micro-batch); with timeout_flush=True a
    ProcessingTimeTimeout also flushes idle sessions — so stragglers
    inside the gap extend the session, and state size is O(active
    users), not O(rows): the shape that holds on an unbounded
    100 TB/day stream.

    timeout_flush is for LIVE streams only: registering processing-time
    timeouts makes the engine schedule micro-batches continuously to
    evaluate them, so a trigger(availableNow) backfill would spin until
    every state times out instead of terminating (observed: 259 epochs
    at sf0.01). Batch backfills leave it False — trailing open sessions
    simply stay in state, exactly as they would mid-stream."""
    import pandas as pd

    out_schema = (f"{user_col} long, session_start timestamp, "
                  f"session_end timestamp, n_events long")
    state_schema = "start long, last long, n long"
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(key, pdf_iter, state):
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((key[0], start, last, n))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdf_iter:
                ts.extend(pdf[ts_col].astype("int64").tolist())
            ts.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = ts[0]
                n = 0
            for t in ts:
                if t - last > gap_ns:
                    closed.append((key[0], start, last, n))
                    start, n = t, 0
                n += 1
                last = max(last, t)
            state.update((start, last, n))
            if timeout_flush:
                state.setTimeoutDuration(int(gap_seconds * 1000))
        yield pd.DataFrame(
            {user_col: [c[0] for c in closed],
             "session_start": [pd.to_datetime(c[1], unit="ns") for c in closed],
             "session_end": [pd.to_datetime(c[2], unit="ns") for c in closed],
             "n_events": [c[3] for c in closed]})

    timeout_conf = "ProcessingTimeTimeout" if timeout_flush else "NoTimeout"
    return (
        source.groupBy(user_col)
        .applyInPandasWithState(fn, out_schema, state_schema,
                                "append", timeout_conf)
    )


def streaming_dedup(
    source: DataFrame,
    keys: list[str],
    event_time: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup on a stream — the streaming twin of
    llm/dedup.exact_dedup. dropDuplicatesWithinWatermark keeps ONE row
    per key and expires its state once the watermark passes, so state
    is bounded by (dup horizon x arrival rate) instead of growing with
    the full key cardinality the way dropDuplicates does — at 100 TB/day
    the unbounded form OOMs the state store, the watermarked form
    doesn't. Duplicates arriving later than the watermark are emitted
    (the documented at-least-once contract for very-late data); set the
    watermark to the pipeline's dup horizon."""
    return source.withWatermark(event_time, watermark) \
        .dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join (attribution pattern): a
    left event matches right events within [left_time - max_delay,
    left_time]. The time-range predicate is what lets Spark bound BOTH
    join-state buffers (right rows older than left's watermark +
    max_delay are evicted); an unconstrained stream-stream equi-join
    must buffer each side forever. Non-key columns must not clash
    (pre-alias them); the right key column is renamed internally and
    dropped from the output."""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withColumnRenamed(on, "__rk").withWatermark(
        right_time, watermark)
    return lw.join(
        rw,
        F.expr(
            f"{on} = __rk AND {right_time} >= {left_time} - INTERVAL {max_delay}"
            f" AND {right_time} <= {left_time}"
        ),
    ).drop("__rk")


def streaming_volume_monitor(events: DataFrame, baseline: DataFrame,
                             event_time: str = "ts",
                             key: str = "event_type",
                             window_size: str = "1 day",
                             watermark: str = "1 day",
                             z_thresh: float = 3.0) -> DataFrame:
    """Live observability: windowed per-key volumes scored against a
    PRECOMPUTED baseline table (key, mean, stddev) — the streaming twin
    of plans/anomaly.volume_anomalies (whose batch output over history
    IS the natural baseline source).

    Scale shape: one watermarked tumbling-window aggregate (bounded
    state), baseline joined with an explicit broadcast (a per-key stats
    table is small by construction); z and the flag are projections,
    so the monitor adds zero extra stateful operators.
    """
    win = windowed_aggregate(events, event_time=event_time,
                             window_size=window_size, watermark=watermark,
                             keys=[key])
    b = F.broadcast(baseline.select(
        F.col(key), F.col("mean").alias("__mu"),
        F.col("stddev").alias("__sd")))
    z = F.when(F.col("__sd") > 0,
               (F.col("n_events") - F.col("__mu")) / F.col("__sd"))
    flat = (F.col("__sd") == 0) & (F.col("n_events") != F.col("__mu"))
    return (win.join(b, key, "left")
            .select("window_start", "window_end", key, "n_events",
                    F.round(z, 6).alias("z"),
                    (F.coalesce(F.abs(z) > z_thresh, F.lit(False))
                     | F.coalesce(flat, F.lit(False))).alias("is_anomaly")))


def streaming_winnow_ingest(
    source: DataFrame,
    signatures_path: str,
    checkpoint: str,
    spark: SparkSession,
    trigger: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> StreamingQuery:
    """Continuous winnow-signature maintenance: each micro-batch of new
    documents is winnowed (Schleimer et al. 2003) and its distinct
    (id, gram_hash) rows appended to the durable signature artifact a
    winnow_candidate_pairs(signatures_table=) run wrote — the streaming
    twin of the batch artifact build, i.e. the live half of the
    crawl-dedup shape: the signature store stays current as documents
    land, winnow_candidate_pairs_cross serves incremental batches from
    it, and each document's text is winnowed exactly once, at ingest.

    Exactly-once: the checkpoint replays failed batches; the append is
    idempotent via an id anti-join against the artifact (the scan reads
    only its id column).
    """
    from dbt_fusion_spark.llm.text import winnow_fingerprints

    def ingest(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        existing = bspark.read.parquet(signatures_path)
        new = (batch.select(id_col, text_col)
               .dropDuplicates([id_col])
               .join(existing.select(F.col("__id").alias(id_col))
                     .distinct(), id_col, "left_anti"))
        if new.isEmpty():
            return
        sigs = (winnow_fingerprints(new, id_col, text_col, k=k,
                                    window=window)
                .select(F.col(id_col).alias("__id"), "gram_hash")
                .distinct())
        sigs.write.mode("append").parquet(signatures_path)

    writer = (
        source.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def streaming_psi_monitor(events: DataFrame, baseline_hist: DataFrame,
                          value_col: str = "value",
                          event_time: str = "ts",
                          window_size: str = "1 day",
                          watermark: str = "0 seconds",
                          bin_width: float = 50.0,
                          eps: float = 1e-6,
                          threshold: float = 0.2) -> DataFrame:
    """Live distribution-drift monitor: per-window PSI of a value
    column against a PRECOMPUTED baseline histogram (bin, base_frac) —
    the streaming twin of plans/stats.psi_drift (whose batch run over a
    reference period IS the natural baseline source).

    Two chained stateful operators (Spark >= 3.4): a watermarked
    (window, bin) count, then a per-window rollup that collects the
    bounded histogram (state = range/bin_width structs per window,
    bounded by construction — never raw rows).  The PSI itself is two
    JVM higher-order folds over the collected histogram and the
    broadcast baseline array: one term per baseline bin (eps-floored
    when the window missed it), one per observed bin absent from the
    baseline.  Terms round(9)-quantize into DECIMAL(38,9) inside the
    fold accumulator, so the emitted PSI is independent of
    collect_list order (the plans/stats float recipe).
    """
    win_col = F.window(event_time, window_size)
    hist = (events
            .withWatermark(event_time, watermark)
            .groupBy(win_col.alias("win"),
                     F.floor(F.col(value_col) / F.lit(bin_width))
                      .cast("bigint").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n")))
    obs = (hist.groupBy(F.window(F.col("win"), window_size).alias("w"))
               .agg(F.collect_list(F.struct("bin", "n")).alias("__obs"),
                    F.sum("n").alias("__total")))
    base = F.broadcast(
        baseline_hist
        .select(F.lit(1).alias("__k"),
                F.col("bin").cast("bigint").alias("bin"),
                F.col("base_frac").cast("double").alias("base_frac"))
        .groupBy("__k")
        .agg(F.collect_list(F.struct("bin", "base_frac"))
             .alias("__base")))
    j = obs.withColumn("__k", F.lit(1)).join(base, "__k")
    # q(bin) = observed fraction (eps floor); p = baseline fraction.
    # fold accumulator is DECIMAL(28,9): acc(28,9) + term(20,9) widens
    # to (29,9), cast back exactly — a (38,9) accumulator would widen
    # past precision 38 and Spark would silently reduce the scale
    # (the CUSUM lesson in plans/stats.py).
    term_base = F.expr(f"""
      aggregate(__base, CAST(0 AS DECIMAL(28,9)), (acc, b) ->
        CAST(acc + CAST(round(
          (greatest(b.base_frac, {eps}D)
           - greatest(coalesce(
               CAST(get(filter(__obs, o -> o.bin = b.bin), 0).n AS DOUBLE)
               / __total, 0D), {eps}D))
          * ln(greatest(b.base_frac, {eps}D)
               / greatest(coalesce(
                   CAST(get(filter(__obs, o -> o.bin = b.bin), 0).n AS DOUBLE)
                   / __total, 0D), {eps}D)), 9) AS DECIMAL(20,9))
        AS DECIMAL(28,9)))
    """)
    term_extra = F.expr(f"""
      aggregate(filter(__obs,
                       o -> NOT exists(__base, b -> b.bin = o.bin)),
        CAST(0 AS DECIMAL(28,9)), (acc, o) ->
        CAST(acc + CAST(round(
          ({eps}D - CAST(o.n AS DOUBLE) / __total)
          * ln({eps}D / (CAST(o.n AS DOUBLE) / __total)), 9)
        AS DECIMAL(20,9)) AS DECIMAL(28,9)))
    """)
    # decimal -> double via a string hop (the plans/stats _d2d rule:
    # DuckDB's direct conversion multiplies by the inexact double
    # 1e-scale and the oracle must match bit-for-bit)
    psi = (term_base + term_extra).cast("string").cast("double")
    return j.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("__total").alias("n_rows"),
        F.round(psi, 6).alias("psi"),
        (psi > threshold).alias("is_drift"))


def streaming_countmin_ingest(
    source: DataFrame,
    sketch_path: str,
    checkpoint: str,
    spark: SparkSession,
    trigger: dict | None = None,
    cols: str = "token",
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> StreamingQuery:
    """Continuous Count-Min maintenance: each micro-batch's sketch
    (depth x width counter grid, llm/sketch.countmin_sketch) is
    APPENDED to a durable partial-sketch artifact keyed by batch id —
    the streaming twin of the batch sketch build.  Count-Min merges by
    SUMMING counters, so the artifact is served by one bounded
    (row, col) rollup (``countmin_from_artifact``) and the stream
    never rewrites history: ingest is append-only, merge is read-time.

    Exactly-once: foreachBatch batch ids are stable within a
    checkpoint, so a replayed batch finds its ``batch_id`` already in
    the artifact and skips — the standard idempotent-sink recipe (the
    id probe reads ONLY the artifact's batch_id column; one bounded
    distinct).  One checkpoint per artifact: a fresh checkpoint means
    a fresh stream and re-ingests by design.

    Scale: per batch, one explode (depth rows/item) + one map-side-
    combined aggregate onto the depth x width grid — the write is
    grid-bounded no matter how large the batch; serving cost is
    O(batches x grid) shrinking to O(grid) after any compaction
    rewrite (read + overwrite with the rollup).
    """
    from dbt_fusion_spark.llm.sketch import countmin_sketch

    def ingest(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        try:
            done = {r.batch_id for r in
                    bspark.read.parquet(sketch_path)
                    .select("batch_id").distinct().collect()}
        except AnalysisException:
            # Only the missing-artifact case (PATH_NOT_FOUND on the
            # first batch) means "no batches ingested yet".  Any other
            # read failure (transient FS error, corrupt footer) must
            # propagate: swallowing it would let a replayed batch
            # re-append and double-count.
            done = set()
        if batch_id in done:
            return
        sk = countmin_sketch(batch, cols, depth, width, seed) \
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        sk.write.mode("append").parquet(sketch_path)

    writer = (
        source.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def countmin_from_artifact(spark: SparkSession,
                           sketch_path: str) -> DataFrame:
    """Serve the streamed partial-sketch artifact as ONE Count-Min
    sketch: counters sum on (row, col) — the mergeability that makes
    Count-Min streaming-native. Feed straight to countmin_estimate."""
    return (spark.read.parquet(sketch_path)
            .groupBy("row", "col")
            .agg(F.sum("cnt").cast("bigint").alias("cnt")))


def streaming_hll_ingest(
    source: DataFrame,
    sketch_path: str,
    checkpoint: str,
    spark: SparkSession,
    trigger: dict | None = None,
    cols: str = "user_id",
    p: int = 10,
    seed: int = 42,
) -> StreamingQuery:
    """Continuous HyperLogLog maintenance — the distinct-count twin of
    streaming_countmin_ingest: each micro-batch's register grid
    (llm/sketch.hll_sketch) appends to a durable partial-sketch
    artifact keyed by batch id; HLL merges by per-register MAX, so the
    live estimate is one bounded rollup away (``hll_from_artifact``)
    and ingest never rewrites history.  Same idempotent-sink batch-id
    contract as the Count-Min ingest.

    Scale: per batch one projection + one MAX aggregate onto the
    2^p-bounded grid — the write is grid-bounded no matter the batch.
    """
    from dbt_fusion_spark.llm.sketch import hll_sketch

    def ingest(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        try:
            done = {r.batch_id for r in
                    bspark.read.parquet(sketch_path)
                    .select("batch_id").distinct().collect()}
        except AnalysisException:
            # Only the missing-artifact case (PATH_NOT_FOUND on the
            # first batch) means "no batches ingested yet".  Any other
            # read failure (transient FS error, corrupt footer) must
            # propagate: swallowing it would let a replayed batch
            # re-append and double-count.
            done = set()
        if batch_id in done:
            return
        sk = hll_sketch(batch, cols, p, seed) \
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        sk.write.mode("append").parquet(sketch_path)

    writer = (
        source.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def hll_from_artifact(spark: SparkSession,
                      sketch_path: str) -> DataFrame:
    """Serve the streamed partial-register artifact as ONE HLL sketch:
    per-register MAX — feed straight to hll_estimate."""
    return (spark.read.parquet(sketch_path)
            .groupBy("register")
            .agg(F.max("max_rank").cast("bigint").alias("max_rank")))
