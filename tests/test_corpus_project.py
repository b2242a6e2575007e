"""End-to-end: the LLM training-data pipeline AS a dbt project.

The corpus_project fixture composes the engine's two halves — dbt-style
materializations (view / python model / incremental merge / generic
tests) driving the LLM operator library (gopher_signals) — the way a
training-data team would actually deploy this engine: raw drop ->
staging view -> python-model quality signals -> incremental
quality-filtered mart -> per-domain stats, with schema tests gating
the output. Reference surface: python models + incremental merge +
generic tests (SURVEY §2.1), composed.
"""

from __future__ import annotations

import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dbt_fusion_spark.llm import quality as Q
from dbt_fusion_spark.runner import DbtSparkRunner
from dbt_fusion_spark.sources.registry import load_table

PROJECT = str(Path(__file__).parent / "fixtures" / "corpus_project")
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def schema():
    return f"corpus_e2e_{uuid.uuid4().hex[:8]}"


@pytest.fixture(scope="module")
def first_run(spark, schema):
    runner = DbtSparkRunner(
        spark, PROJECT,
        profile={"schema": schema, "threads": 2, "name": "corpus_e2e"})
    rr = runner.run()
    yield runner, rr
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")


def test_pipeline_all_green(first_run):
    _, rr = first_run
    bad = [(r.unique_id, r.status, r.message) for r in rr.results
           if r.status not in ("success", "pass")]
    assert rr.ok and not bad, bad
    # the generic tests actually ran: unique/not_null on both models,
    # accepted_values on lang, not_null on the stats
    test_ids = [r.unique_id for r in rr.results
                if r.unique_id.startswith("test.")]
    assert len(test_ids) >= 6


def test_clean_docs_matches_direct_algebra(first_run, spark, schema):
    """The mart equals the same pipeline expressed directly against the
    operator library — materializations add orchestration, never drift."""
    docs = (load_table(spark, SF_DIR, "documents")
            .filter(F.col("text").isNotNull()
                    & (F.length(F.trim(F.col("text"))) > 0)))
    sig = Q.gopher_signals(docs, "text", "doc_id")
    expected = (docs.join(sig, "doc_id")
                .filter((F.col("n_words") >= 5)
                        & (F.col("dup_line_frac") <= 0.5)))
    got = spark.table(f"{schema}.clean_docs")
    assert got.count() == expected.count() > 0
    assert (got.join(expected.select("doc_id"), "doc_id", "left_anti")
            .count() == 0)
    # stats roll up exactly to the mart
    stats = spark.table(f"{schema}.corpus_stats")
    assert (stats.agg(F.sum("n_docs")).collect()[0][0] == got.count())


def test_incremental_second_run_idempotent(first_run, spark, schema):
    runner, _ = first_run
    before = spark.table(f"{schema}.clean_docs").count()
    rr2 = runner.run(select="clean_docs", include_tests=False)
    assert rr2.ok, [(r.unique_id, r.message) for r in rr2.results]
    assert spark.table(f"{schema}.clean_docs").count() == before


def test_dedup_models_compose_new_operators(first_run, spark, schema):
    """The late-r7 operators run AS python models in the same DAG:
    substring removal over the mart (never removes more words than a
    doc has) and the winnow near-dup pair audit (ids must come from
    the mart)."""
    cleaned = spark.table(f"{schema}.substring_cleaned")
    assert cleaned.count() == spark.table(f"{schema}.clean_docs").count()
    assert cleaned.filter("n_dup_words > n_words").count() == 0
    pairs = spark.table(f"{schema}.winnow_dup_pairs")
    mart_ids = {r[0] for r in
                spark.table(f"{schema}.clean_docs")
                .select("doc_id").collect()}
    for r in pairs.select("id_a", "id_b").collect():
        assert r["id_a"] in mart_ids and r["id_b"] in mart_ids


def test_drift_report_composes_stats_operator(first_run, spark, schema):
    """The late-r8 PSI operator runs AS a python model: the report
    equals the direct algebra over the staged docs, and identical
    halves of a symmetric corpus stay under the 0.2 line."""
    from dbt_fusion_spark.plans.stats import psi_drift

    docs = (load_table(spark, SF_DIR, "documents")
            .filter(F.col("text").isNotNull()
                    & (F.length(F.trim(F.col("text"))) > 0)))
    expected = psi_drift(docs.filter(F.col("doc_id") % 2 == 0),
                         docs.filter(F.col("doc_id") % 2 == 1),
                         "n_chars", bin_width=200.0)
    got = spark.table(f"{schema}.drift_report")
    assert got.count() == expected.count() > 0
    e = {r.bin: r for r in expected.collect()}
    for r in got.collect():
        assert r.psi_total == e[r.bin].psi_total
        assert r.psi_term == e[r.bin].psi_term
    # even/odd halves of one corpus: no real drift
    assert got.collect()[0].psi_total < 0.2
