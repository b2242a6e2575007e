"""Property-based tests (hypothesis) for the strategy algebra.

The reference's correctness burden sits in exactly these invariants
(SURVEY §7 'genuinely hard' list): merge key-uniqueness under NULLs,
snapshot idempotency, microbatch window tiling. Pure-python properties
run hundreds of cases; Spark-backed ones run a bounded sample.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from dbt_fusion_spark.incremental import microbatch_windows

TS = st.datetimes(min_value=dt.datetime(1990, 1, 1),
                  max_value=dt.datetime(2030, 1, 1))


@given(begin=TS, span=st.integers(min_value=0, max_value=5000),
       batch_size=st.sampled_from(["hour", "day", "month", "year"]))
@settings(max_examples=200)
def test_microbatch_windows_tile_exactly(begin, span, batch_size):
    """Windows must tile [trunc(begin), end): contiguous, non-empty,
    covering — a gap loses data, an overlap double-processes it."""
    end = begin + dt.timedelta(hours=span)
    wins = microbatch_windows(begin, end, batch_size)
    if not wins:
        # only a fully-empty aligned interval may produce no windows
        assert begin == end
        return
    for lo, hi in wins:
        assert lo < hi
    for (_, hi1), (lo2, _) in zip(wins, wins[1:]):
        assert hi1 == lo2  # contiguous, no gap, no overlap
    assert wins[0][0] <= begin          # first window contains begin
    assert wins[-1][1] >= end           # last window reaches end
    assert wins[-1][0] < end            # no fully-empty trailing window


@given(rows=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 100)), min_size=0, max_size=20),
    batch=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 100)), min_size=0, max_size=20))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_invariants(spark, rows, batch):
    """merge(target, source, key): result keys unique; every source key
    carries the source value; target-only keys survive untouched."""
    from dbt_fusion_spark.incremental import merge

    # last write per key wins within the batch (dbt requires unique
    # keys in the source; dedupe like a well-formed model would)
    src = list({k: (k, v) for k, v in batch}.values())
    tgt = list({k: (k, v) for k, v in rows}.values())
    target = spark.createDataFrame(tgt or [(None, None)],
                                           "k int, v int").filter("k IS NOT NULL")
    source = spark.createDataFrame(src or [(None, None)],
                                           "k int, v int").filter("k IS NOT NULL")
    got = {r["k"]: r["v"] for r in merge(target, source, "k").collect()}
    want = dict(tgt)
    want.update(dict(src))
    assert got == want


@given(n=st.integers(1, 50), mod=st.integers(1, 10))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hash_sample_partitions(spark, n, mod):
    """Hash sampling (dbt-sample Hash strategy): buckets partition the
    rows — every row lands in exactly one of the `mod` buckets, and
    bucketing is deterministic across evaluations."""
    from dbt_fusion_spark.sample import sample_hash

    df = spark.range(n).withColumnRenamed("id", "k")
    # keep is a cumulative threshold: bucket(key) < keep
    counts = [sample_hash(df, by="k", mod=mod, keep=k).count()
              for k in range(mod + 1)]
    assert counts[0] == 0          # keep=0 selects nothing
    assert counts[mod] == n        # keep=mod selects everything
    assert all(a <= b for a, b in zip(counts, counts[1:]))  # monotone
    # determinism: re-evaluation yields the same subset
    sub = sample_hash(df, by="k", mod=mod, keep=1)
    assert {r["k"] for r in sub.collect()} == {r["k"] for r in sub.collect()}


def test_snapshot_idempotent_under_unchanged_source(spark):
    """snapshot_run with a byte-identical source adds no versions and
    closes nothing — the core SCD2 idempotency invariant."""
    from dbt_fusion_spark.snapshots import (
        SnapshotConfig, snapshot_build, snapshot_run)

    src = spark.createDataFrame(
        [(1, "a", dt.datetime(2020, 1, 1)), (2, "b", dt.datetime(2020, 1, 2))],
        "id int, val string, updated_at timestamp")
    cfg = SnapshotConfig(unique_key="id", strategy="timestamp",
                         updated_at="updated_at")
    snap = snapshot_build(src, cfg)
    again = snapshot_run(snap, src, cfg)
    assert again.count() == snap.count() == 2
    assert again.filter("dbt_valid_to IS NOT NULL").count() == 0


@given(fr=st.lists(st.integers(1, 10), min_size=2, max_size=5),
       seed=st.integers(0, 3))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_split_assign_partitions_completely(spark, fr, seed):
    """Any fraction vector summing to 1 yields a total, deterministic
    partition of the keyspace — no row lost, none double-labeled."""
    from dbt_fusion_spark.sample.strategies import split_assign

    total = sum(fr)
    fracs = {f"s{i}": f / total for i, f in enumerate(fr)}
    # force exact sum-to-1 (float division residue goes to the last)
    fracs[f"s{len(fr) - 1}"] = 1.0 - sum(
        v for k, v in fracs.items() if k != f"s{len(fr) - 1}")
    df = spark.range(300).withColumnRenamed("id", "k")
    out = split_assign(df, "k", fracs, seed=seed).collect()
    assert len(out) == 300
    assert {r["split"] for r in out} <= set(fracs)
    again = {(r["k"], r["split"])
             for r in split_assign(df.repartition(5), "k", fracs,
                                   seed=seed).collect()}
    assert again == {(r["k"], r["split"]) for r in out}


@given(lens=st.lists(st.integers(0, 35), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_span_dedup_invariants(spark, lens):
    """Span accounting holds for arbitrary word counts: n_spans =
    ceil(words/10) per non-empty doc, dup fraction in [0,1], and every
    distinct span text keeps at least one non-duplicate occurrence."""
    import math

    from dbt_fusion_spark.llm.dedup import span_dedup_stats

    rows = [(i, " ".join(f"w{j % 7}" for j in range(n)))
            for i, n in enumerate(lens) if n > 0]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           span_dedup_stats(df, "doc_id", "text", span_words=10).collect()}
    assert set(out) == {i for i, _ in rows}
    kept_total = 0
    for i, text in rows:
        n_words = len(text.split())
        r = out[i]
        assert r["n_spans"] == math.ceil(n_words / 10)
        assert 0 <= r["n_dup_spans"] <= r["n_spans"]
        kept_total += r["n_spans"] - r["n_dup_spans"]
    distinct_spans = len({
        " ".join(text.split()[k * 10:(k + 1) * 10])
        for _, text in rows
        for k in range(math.ceil(len(text.split()) / 10))})
    assert kept_total == distinct_spans  # exactly one keeper per span text


@given(texts=st.lists(
    st.lists(st.sampled_from(["the quick brown fox", "jumps over dogs",
                              "pack my box with jugs", "ok", ""]),
             min_size=1, max_size=5),
    min_size=1, max_size=8))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_invariants(spark, texts):
    """(1) kept-line accounting: n_lines_kept == lines(clean_text)
    whenever any line survives; (2) every distinct long line survives
    EXACTLY once corpus-wide; (3) short lines always survive."""
    from dbt_fusion_spark.llm.dedup import line_dedup

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(texts)],
        "doc_id long, text string")
    rows = line_dedup(df, "doc_id", "text", min_chars=10).collect()
    assert len(rows) == len(texts)
    surviving: dict[str, int] = {}
    all_kept: list[str] = []
    for r in rows:
        # a clean_text of "" is either zero kept lines or one kept
        # EMPTY line — n_lines_kept disambiguates
        if r["n_lines_kept"] == 0:
            assert r["clean_text"] == ""
            kept = []
        else:
            kept = r["clean_text"].split("\n")
            assert r["n_lines_kept"] == len(kept)
        all_kept.extend(kept)
        for line in kept:
            if len(line.strip()) >= 10:
                key = line.strip().lower()
                surviving[key] = surviving.get(key, 0) + 1
    all_long = {ln.strip().lower() for lines in texts for ln in lines
                if len(ln.strip()) >= 10}
    assert surviving == {k: 1 for k in all_long}
    # short lines all survive: totals match input
    n_short_in = sum(1 for lines in texts for ln in lines
                     if len(ln.strip()) < 10)
    n_short_out = sum(1 for ln in all_kept if len(ln.strip()) < 10)
    assert n_short_out == n_short_in


@given(vecs=st.lists(
    st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False,
                       width=32),
             min_size=1, max_size=8),
    min_size=1, max_size=10))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quantize_roundtrip_error_bound(spark, vecs):
    """Symmetric int8 quantization: every component's reconstruction
    error is <= scale/2 (+eps), q values lie in [-127, 127], and
    all-zero vectors quantize to zeros with scale 0."""
    from dbt_fusion_spark.llm.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        r = rows[i]
        assert all(-127 <= q <= 127 for q in r["qvec"])
        if max(abs(x) for x in v) == 0:
            assert r["scale"] == 0.0 and set(r["qvec"]) == {0}
        else:
            assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9


@given(rows=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15), st.integers(0, 99)),
    min_size=1, max_size=25),
    batch=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15), st.integers(0, 99)),
    min_size=1, max_size=25))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_partition_scoped_merge_equals_algebra(spark, rows, batch):
    """r4 centerpiece certified property-style: the executor's
    partition-scoped overwrite must land EXACTLY the pure merge
    algebra's result for random partitioned targets/batches (new
    partitions, multi-row partitions, overlapping keys)."""
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.incremental import merge
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
    )

    tgt = list({(p, i): (p, i, v) for p, i, v in rows}.values())
    src = list({(p, i): (p, i, v) for p, i, v in batch}.values())

    def values_sql(data):
        vals = ", ".join(f"({p}, {i}, {v})" for p, i, v in data)
        return f"SELECT * FROM VALUES {vals} AS t(p, id, v)"

    spark.sql("CREATE DATABASE IF NOT EXISTS prop")
    adapter = SparkAdapter(spark=spark, default_schema="prop")
    kw = dict(strategy="merge", unique_key=["p", "id"], partition_by="p")
    materialize_incremental(adapter, "prop", "ps_prop", values_sql(tgt),
                            full_refresh=True, **kw)
    want = {(r["p"], r["id"], r["v"]) for r in merge(
        spark.createDataFrame(tgt, "p int, id int, v int"),
        spark.createDataFrame(src, "p int, id int, v int"),
        unique_key=["p", "id"]).collect()}
    out = materialize_incremental(adapter, "prop", "ps_prop",
                                  values_sql(src), **kw)
    assert "partition-scoped" in out
    got = {(r["p"], r["id"], r["v"])
           for r in spark.table("prop.ps_prop").collect()}
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15), st.integers(0, 99)),
    min_size=1, max_size=20),
    batch=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15), st.integers(0, 99)),
    min_size=1, max_size=20),
    thresh=st.integers(0, 4))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_partition_scoped_replace_where_equals_algebra(spark, rows, batch,
                                                      thresh):
    """Scoped replace_where (incl. its DROP-PARTITION handling for
    predicate-wiped partitions) must equal the pure algebra for random
    data and predicate thresholds."""
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.incremental import replace_where
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
    )

    tgt = list({(p, i): (p, i, v) for p, i, v in rows}.values())
    src = list({(p, i): (p, i, v) for p, i, v in batch}.values())
    pred = f"p >= {thresh}"

    def values_sql(data):
        vals = ", ".join(f"({p}, {i}, {v})" for p, i, v in data)
        return f"SELECT * FROM VALUES {vals} AS t(p, id, v)"

    spark.sql("CREATE DATABASE IF NOT EXISTS prop")
    adapter = SparkAdapter(spark=spark, default_schema="prop")
    materialize_incremental(adapter, "prop", "rw_prop", values_sql(tgt),
                            strategy="merge", unique_key=["p", "id"],
                            partition_by="p", full_refresh=True)
    want = {(r["p"], r["id"], r["v"]) for r in replace_where(
        spark.createDataFrame(tgt, "p int, id int, v int"),
        spark.createDataFrame(src, "p int, id int, v int"),
        pred).collect()}
    out = materialize_incremental(adapter, "prop", "rw_prop",
                                  values_sql(src),
                                  strategy="replace_where",
                                  partition_by="p",
                                  incremental_predicates=[pred])
    assert "partition-scoped" in out
    got = {(r["p"], r["id"], r["v"])
           for r in spark.table("prop.rw_prop").collect()}
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15), st.integers(0, 99)),
    min_size=1, max_size=20),
    batch=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15), st.integers(0, 99)),
    min_size=1, max_size=20))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_partition_scoped_delete_insert_equals_algebra(spark, rows, batch):
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.incremental import delete_insert
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
    )

    tgt = list({(p, i): (p, i, v) for p, i, v in rows}.values())
    src = list({(p, i): (p, i, v) for p, i, v in batch}.values())

    def values_sql(data):
        vals = ", ".join(f"({p}, {i}, {v})" for p, i, v in data)
        return f"SELECT * FROM VALUES {vals} AS t(p, id, v)"

    spark.sql("CREATE DATABASE IF NOT EXISTS prop")
    adapter = SparkAdapter(spark=spark, default_schema="prop")
    kw = dict(strategy="delete+insert", unique_key=["p", "id"],
              partition_by="p")
    materialize_incremental(adapter, "prop", "di_prop", values_sql(tgt),
                            full_refresh=True, **kw)
    want = {(r["p"], r["id"], r["v"]) for r in delete_insert(
        spark.createDataFrame(tgt, "p int, id int, v int"),
        spark.createDataFrame(src, "p int, id int, v int"),
        unique_key=["p", "id"]).collect()}
    out = materialize_incremental(adapter, "prop", "di_prop",
                                  values_sql(src), **kw)
    assert "partition-scoped" in out
    got = {(r["p"], r["id"], r["v"])
           for r in spark.table("prop.di_prop").collect()}
    assert got == want


@given(run1=st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 30)),
    min_size=1, max_size=12),
    run2=st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 30)),
    min_size=1, max_size=12),
    hard_deletes=st.sampled_from(["ignore", "invalidate", "new_record"]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_staged_changes_property(spark, run1, run2, hard_deletes):
    """SCD-2 staged-change set applied with MERGE semantics equals
    snapshot_run for random two-run histories (random
    changes/inserts/deletes) under every hard_deletes mode — the
    algebraic guarantee behind the native snapshot MERGE path."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from dbt_fusion_spark.snapshots import SnapshotConfig
    from dbt_fusion_spark.snapshots.scd2 import (
        snapshot_build, snapshot_run, snapshot_staged_changes)
    from tests.test_native_dml import _apply_staged_merge

    cfg = SnapshotConfig(unique_key="id", strategy="check",
                         check_cols="all", hard_deletes=hard_deletes)
    t1 = datetime(2024, 2, 1)
    src0 = spark.createDataFrame(
        list({k: (k, v) for k, v in run1}.values()), "id long, v long")
    src1 = spark.createDataFrame(
        list({k: (k, v) for k, v in run2}.values()), "id long, v long")
    existing = snapshot_build(
        src0, cfg, now=F.lit(datetime(2024, 1, 1)).cast("timestamp")
    ).localCheckpoint()
    now = F.lit(t1).cast("timestamp")
    want = {tuple(r) for r in
            snapshot_run(existing, src1, cfg, now=now).collect()}
    staged = snapshot_staged_changes(existing, src1, cfg, now=now)
    got = {tuple(r) for r in
           _apply_staged_merge(existing, staged).collect()}
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15),
              st.one_of(st.none(), st.integers(0, 9))),
    min_size=1, max_size=20),
    batch=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15),
              st.one_of(st.none(), st.integers(0, 9))),
    min_size=1, max_size=20))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_replace_where_rungs_agree(spark, rows, batch):
    """ADVICE r4 (medium) certified property-style: the full-rewrite
    and partition-scoped replace_where rungs must land EXACTLY the
    pure algebra's result — including target rows whose predicate
    evaluates NULL (the nullable `s` column), which NOT(pred) alone
    would have deleted on the rewrite rung only."""
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.incremental import replace_where
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
    )

    tgt = list({(p, i): (p, i, s) for p, i, s in rows}.values())
    src = list({(p, i): (p, i, s) for p, i, s in batch}.values())
    pred = "s >= 5"

    def values_sql(data):
        vals = ", ".join(
            f"({p}, {i}, {'CAST(NULL AS INT)' if s is None else s})"
            for p, i, s in data)
        return f"SELECT * FROM VALUES {vals} AS t(p, id, s)"

    spark.sql("CREATE DATABASE IF NOT EXISTS prop")
    adapter = SparkAdapter(spark=spark, default_schema="prop")
    want = {(r["p"], r["id"], r["s"]) for r in replace_where(
        spark.createDataFrame(tgt, "p int, id int, s int"),
        spark.createDataFrame(src, "p int, id int, s int"),
        pred).collect()}

    for suffix, extra in (("rw", {}), ("ps", {"partition_by": "p"})):
        name = f"rw_prop_{suffix}"
        materialize_incremental(
            adapter, "prop", name, values_sql(tgt),
            strategy="merge", unique_key=["p", "id"],
            full_refresh=True, **extra)
        out = materialize_incremental(
            adapter, "prop", name, values_sql(src),
            strategy="replace_where", incremental_predicates=[pred],
            **extra)
        if suffix == "ps":
            assert out.startswith("REPLACE WHERE (partition-scoped") \
                or out == "REPLACE WHERE"  # NULL partition key falls back
        got = {(r["p"], r["id"], r["s"])
               for r in spark.table(f"prop.{name}").collect()}
        assert got == want, (suffix, out)


@given(epochs=st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.floats(min_value=0.05, max_value=4.0,
              allow_nan=False, allow_infinity=False),
    min_size=0, max_size=3),
    seed=st.integers(0, 10))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_upsample_epochs_count_bounds_and_partition(spark, epochs, seed):
    """For every domain: floor(e)*n <= emitted <= ceil(e)*n; epoch
    indexes form a prefix of 0..ceil(e)-1 per doc (a doc emitted at
    epoch k is emitted at every epoch < k); unspecified domains pass
    through exactly once."""
    import math

    from pyspark.sql import functions as F

    from dbt_fusion_spark.llm.corpus import upsample_epochs

    docs = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4]) for i in range(40)],
        "doc_id long, source string")
    rows = upsample_epochs(docs, "source", "doc_id", epochs,
                           seed=seed).collect()
    per_dom: dict[str, list] = {}
    per_doc: dict[int, list] = {}
    for r in rows:
        per_dom.setdefault(r["source"], []).append(r)
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    n = 10  # docs per domain
    for dom in ("a", "b", "c", "d"):
        e = epochs.get(dom, 1.0)
        cnt = len(per_dom.get(dom, []))
        assert n * math.floor(e) <= cnt <= n * math.ceil(e), (dom, e, cnt)
    for doc, eps in per_doc.items():
        assert sorted(eps) == list(range(len(eps))), (doc, eps)


@given(old_ids=st.sets(st.integers(0, 30), max_size=20),
       new_ids=st.sets(st.integers(0, 30), max_size=20),
       changed=st.sets(st.integers(0, 30), max_size=10),
       null_old=st.sets(st.integers(0, 30), max_size=5),
       null_new=st.sets(st.integers(0, 30), max_size=5))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_corpus_diff_partitions_id_universe(spark, old_ids, new_ids,
                                            changed, null_old, null_new):
    """corpus_diff emits every id from either side exactly once, with
    the status a pure function of membership + null-safe content
    equality — NULL text means PRESENT with a broken body (scraper
    regression), never absent: NULL-vs-text is changed, NULL-vs-NULL
    is unchanged."""
    from dbt_fusion_spark.llm.corpus import corpus_diff

    if not old_ids and not new_ids:
        return
    old = spark.createDataFrame(
        [(i, None if i in null_old else f"text-{i}")
         for i in sorted(old_ids)] or [(None, None)],
        "doc_id long, text string").filter("doc_id IS NOT NULL")
    new = spark.createDataFrame(
        [(i, None if i in null_new
          else f"text-{i}-v2" if i in changed else f"text-{i}")
         for i in sorted(new_ids)] or [(None, None)],
        "doc_id long, text string").filter("doc_id IS NOT NULL")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert set(got) == old_ids | new_ids
    for i in old_ids | new_ids:
        if i not in new_ids:
            want = "removed"
        elif i not in old_ids:
            want = "added"
        else:
            o_null, n_null = i in null_old, i in null_new
            if o_null and n_null:
                want = "unchanged"
            elif o_null or n_null:
                want = "changed"
            else:
                want = "changed" if i in changed else "unchanged"
        assert got[i] == want, (i, got[i], want)


@given(n_shards=st.integers(1, 16), seed=st.integers(0, 5))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_shard_assignment_total_and_stable(spark, n_shards, seed):
    """Every key gets exactly one shard in [0, n_shards); the
    assignment is a pure function of (seed, key) — independent of
    which other rows are present."""
    from dbt_fusion_spark.llm.export import with_shard

    docs = spark.range(60).selectExpr("id AS doc_id")
    full = {r["doc_id"]: r["shard"] for r in
            with_shard(docs, "doc_id", n_shards, seed).collect()}
    assert set(full) == set(range(60))
    assert all(0 <= s < n_shards for s in full.values())
    half = {r["doc_id"]: r["shard"] for r in
            with_shard(docs.filter("doc_id % 2 = 0"), "doc_id",
                       n_shards, seed).collect()}
    assert all(full[k] == v for k, v in half.items())


@given(texts=st.lists(
    st.lists(st.sampled_from(["the quick brown fox", "jumps over dogs",
                              "pack my box with jugs", "ok", ""]),
             min_size=1, max_size=5),
    min_size=1, max_size=8),
    min_docs=st.integers(2, 4))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_frequency_filter_invariants(spark, texts, min_docs):
    """A long line is dropped iff its normalized form appears in >=
    min_docs DISTINCT docs — and then from EVERY doc (no keeper);
    short lines always survive; per-doc accounting and original line
    order hold."""
    from dbt_fusion_spark.llm.dedup import line_frequency_filter

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(texts)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            line_frequency_filter(df, "doc_id", "text",
                                  min_docs=min_docs,
                                  min_chars=10).collect()}
    assert set(rows) == set(range(len(texts)))
    doc_freq: dict[str, set[int]] = {}
    for i, lines in enumerate(texts):
        for ln in lines:
            if len(ln.strip()) >= 10:
                doc_freq.setdefault(ln.strip().lower(), set()).add(i)
    boiler = {k for k, docs in doc_freq.items() if len(docs) >= min_docs}
    for i, lines in enumerate(texts):
        r = rows[i]
        expected = [ln for ln in lines
                    if len(ln.strip()) < 10
                    or ln.strip().lower() not in boiler]
        assert r["n_lines"] == len(lines)
        assert r["n_lines_kept"] == len(expected)
        if r["n_lines_kept"] == 0:
            assert r["clean_text"] == ""
        else:
            assert r["clean_text"].split("\n") == expected


@given(edges=st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1, max_size=15),
    scores=st.lists(st.integers(0, 5), min_size=12, max_size=12))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_keep_best_keeper_invariants(spark, edges, scores):
    """dedup_keep_best: cluster assignment equals union-find over the
    pair list (singletons keep their own id); exactly one keeper per
    cluster = the max-score member, ties -> min id; cluster_size
    matches."""
    from dbt_fusion_spark.plans.connected_components import dedup_keep_best

    edges = [(a, b) for a, b in edges if a != b]
    n = 12
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in range(n)}
    # canonical label = min member id (find() already yields it since
    # we always parent the larger root to the smaller)
    pairs_df = spark.createDataFrame(edges or [(0, 0)],
                                     "id_a long, id_b long")
    scored = spark.createDataFrame(
        [(i, scores[i]) for i in range(n)], "doc_id long, score long")
    out = dedup_keep_best(pairs_df, scored, "doc_id", "score").collect()
    assert {r["doc_id"] for r in out} == set(range(n))
    by_cluster: dict[int, list] = {}
    for r in out:
        assert r["cluster_id"] == comp[r["doc_id"]]
        assert r["score"] == scores[r["doc_id"]]
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert all(r["cluster_size"] == len(members) for r in members)
        keepers = [r for r in members if r["is_keeper"]]
        assert len(keepers) == 1
        best = min(members, key=lambda r: (-r["score"], r["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]
