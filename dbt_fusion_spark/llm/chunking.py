"""Document chunking and sequence packing — the two reshape operators
between "clean corpus" and "training batches" in an LLM data pipeline.

Both are pure column/window algebra (no Python in the row path):

- chunk_documents: explode fixed-width character windows with overlap.
  One Generate node per doc, no shuffle at all — chunking is
  embarrassingly parallel and the planner keeps it in the scan stage.
- pack_sequences: assign documents to fixed-budget training sequences
  by cumulative token count. Deterministic (doc_id order), one shuffle
  (the window partitioning); the greedy "first-fit" packers used
  offline are order-dependent and unreproducible across engines — this
  is the distributed-reproducible formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_chars: int = 512,
                    overlap: int = 64) -> DataFrame:
    """(id, chunk_idx, chunk_text, chunk_len): windows of `chunk_chars`
    chars starting every (chunk_chars - overlap) chars. The final
    partial window is kept (training pipelines pad it); empty docs
    yield one empty chunk so no document silently disappears."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap))
               / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    return (
        df.select(
            id_col,
            F.col(text_col).alias("__t"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(f"substring(__t, chunk_idx * {stride} + 1, {chunk_chars})")
            .alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   token_col: str = "n_tokens",
                   seq_len: int = 2048) -> DataFrame:
    """Assign each document a training-sequence id such that the
    cumulative token count within a sequence stays near seq_len:
    seq_id = floor((cumsum(tokens) - tokens) / seq_len) in doc_id order
    (the token's own count excluded so a document starts in the
    sequence its first token falls in). Documents longer than seq_len
    still get exactly one sequence id — chunk first (chunk_documents)
    if oversized docs must split.

    Output: (id, n_tokens, seq_id, seq_offset) where seq_offset is the
    token offset of the doc within its sequence's budget stream."""
    w = Window.orderBy(id_col)
    # NOTE: global ordering = single-partition window. At fleet scale,
    # partition the window by a coarse shard key first (e.g. hash(id)
    # bucket) — packing quality is unaffected since budgets reset per
    # shard. Kept global here for exact cross-engine reproducibility.
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (cum - F.col(token_col)).cast("bigint")
    return df.select(
        id_col,
        F.col(token_col),
        F.floor(start / F.lit(seq_len)).cast("bigint").alias("seq_id"),
        (start % F.lit(seq_len)).alias("seq_offset"),
    )


def pack_sequences_sharded(df: DataFrame, id_col: str = "doc_id",
                           token_col: str = "n_tokens",
                           seq_len: int = 2048,
                           n_shards: int = 32,
                           shard_hash: str = "xxhash64",
                           seed: int = 42) -> DataFrame:
    """The scale path: per-shard packing windows (hash(id) % n_shards),
    n_shards parallel cumsum partitions instead of one global sort.
    seq_id is (shard, local_seq) flattened; same budget guarantee.

    shard_hash: 'xxhash64' (fastest, JVM-native) or 'md5' — the
    engine-portable unit hash shared with sample/strategies.py, so the
    shard assignment (and therefore every seq_id) is exactly
    restatable in any engine with md5: the oracle-checkable variant.
    """
    if shard_hash == "xxhash64":
        shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
    elif shard_hash == "md5":
        from dbt_fusion_spark.sample.strategies import _unit_hash

        shard = F.pmod(_unit_hash([id_col], seed), F.lit(n_shards))
    else:
        raise ValueError(f"unknown shard_hash {shard_hash!r}")
    w = Window.partitionBy("__shard").orderBy(id_col)
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (cum - F.col(token_col)).cast("bigint")
    return (
        df.withColumn("__shard", shard)
        .select(
            id_col,
            F.col(token_col),
            (F.col("__shard") * F.lit(1_000_000_000)
             + F.floor(start / F.lit(seq_len))).cast("bigint").alias("seq_id"),
            (start % F.lit(seq_len)).alias("seq_offset"),
        )
    )


def batch_by_length(df: DataFrame, id_col: str, text_col: str,
                    n_buckets: int = 8, batch_size: int = 32,
                    max_tokens: int = 2048) -> DataFrame:
    """Length-bucketed batch assignment — the inference/serving prep
    step: group documents of similar token length so a batch pads to
    its own bucket's ceiling instead of the global maximum (padding
    waste is the dominant GPU cost of naive batching).

    bucket = width_bucket(token_estimate, 0, max_tokens, n_buckets)
    (overflow lands in bucket n_buckets+1); batch_id = dense sequence
    within the bucket, `batch_size` docs per batch, ordered by the
    portable md5 unit hash so assignment is deterministic and
    placement-independent.

    Scale shape: one shuffle — the window partitions by bucket (a
    bounded key set) and orders by the hash; no global sort. With very
    large corpora per bucket, shard the window key like
    pack_sequences_sharded."""
    from pyspark.sql import Window

    from dbt_fusion_spark.llm.text import bpe_token_estimate

    toks = bpe_token_estimate(text_col)
    bucketed = df.select(
        F.col(id_col),
        toks.cast("bigint").alias("n_tokens"),
        F.width_bucket(toks.cast("double"), F.lit(0.0),
                       F.lit(float(max_tokens)),
                       F.lit(n_buckets)).alias("len_bucket"),
        F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.lit("42"), F.col(id_col).cast("string"))), 1, 8),
            16, 10).cast("bigint").alias("__h"),
    )
    w = Window.partitionBy("len_bucket").orderBy("__h", id_col)
    return (
        bucketed.withColumn(
            "batch_id",
            F.floor((F.row_number().over(w) - 1) / F.lit(batch_size))
            .cast("bigint"))
        .select(id_col, "n_tokens", "len_bucket", "batch_id")
    )
