"""Training-shard export: determinism, stability, manifest exactness."""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from dbt_fusion_spark.llm.export import (
    shard_manifest,
    with_shard,
    write_training_shards,
)


def _docs(spark, n=200, parts=4):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id")).alias("text"),
        (F.length(F.concat(F.lit("document body "), F.col("id"))))
        .alias("n_chars"))


def _shard_bytes(path: str) -> dict[str, str]:
    """content hash per shard dir (parquet files concatenated in name
    order — one file per shard here, but stay order-stable)."""
    out = {}
    for d in sorted(Path(path).glob("shard=*")):
        h = hashlib.md5()
        for f in sorted(d.glob("*.parquet")):
            h.update(f.read_bytes())
        out[d.name] = h.hexdigest()
    return out


def test_export_reproducible_across_runs_and_partitioning(spark, tmp_path):
    """Two exports of the same corpus — one arriving in 4 input
    partitions, one in 13 — produce byte-identical shard files: the
    trainer can rely on re-exports after a cluster resize."""
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(_docs(spark, parts=4), p1, "doc_id", 8)
    write_training_shards(_docs(spark, parts=13), p2, "doc_id", 8)
    b1, b2 = _shard_bytes(p1), _shard_bytes(p2)
    assert b1 == b2 and len(b1) == 8


def test_shard_membership_stable_under_corpus_growth(spark):
    """A doc's shard is a pure function of (seed, key): adding new docs
    never moves existing ones (incremental-export safety)."""
    small = with_shard(_docs(spark, 100), "doc_id", 8)
    big = with_shard(_docs(spark, 300), "doc_id", 8)
    s = {r["doc_id"]: r["shard"] for r in small.collect()}
    b = {r["doc_id"]: r["shard"] for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_manifest_matches_written_files_and_sums(spark, tmp_path):
    path = str(tmp_path / "out")
    docs = _docs(spark)
    written = {r["shard"]: r["n_rows"] for r in
               write_training_shards(docs, path, "doc_id", 8).collect()}
    planned = {r["shard"]: (r["n_rows"], r["sum_n_chars"]) for r in
               shard_manifest(docs, "doc_id", 8,
                              size_cols=["n_chars"]).collect()}
    assert written == {s: n for s, (n, _) in planned.items()}
    assert sum(n for n, _ in planned.values()) == 200
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(c for _, c in planned.values()) == total_chars


def test_with_shard_validates_n_shards(spark):
    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        with_shard(_docs(spark, 5), "doc_id", 0)
