"""BPE tokenizer: deterministic train, Arrow-batched encode, roundtrip."""

from __future__ import annotations

from dbt_fusion_spark.llm.bpe import (
    EOW, bpe_decode_tokens, bpe_encode, bpe_train)


def _corpus(spark):
    rows = [(i, t) for i, t in enumerate([
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ])]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_frequent_pairs_deterministically(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", n_merges=30)
    assert merges == bpe_train(df, "text", n_merges=30)  # deterministic
    # 'es'+'t' family from 'newest' and 'lo'/'ow' from low/lower appear
    flat = {a + b for a, b in merges}
    assert any("es" in m or "est" in m for m in flat)
    # re-partitioned input learns the SAME table (pure function of data)
    assert merges == bpe_train(df.repartition(7), "text", n_merges=30)


def test_encode_roundtrip_and_counts(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", n_merges=50)
    enc = {r["doc_id"]: r for r in
           bpe_encode(df, "doc_id", "text", merges).collect()}
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    for i, row in enc.items():
        assert row["n_tokens"] == len(row["tokens"])
        assert bpe_decode_tokens(row["tokens"]) == orig[i]  # lossless
    # a fully-merged frequent word collapses to one token
    assert enc[0]["tokens"].count("low" + EOW) >= 4


def test_encode_plan_is_arrow_batched(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", n_merges=10)
    plan = bpe_encode(df, "doc_id", "text", merges)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-wise python
