"""Python model: PSI drift report between two corpus slices via the
engine's stats library — the 'did this crawl shift the length mix'
dashboard a curation team materializes per drop (late-r8 operator
plans/stats.psi_drift composed into the dbt DAG)."""


def model(dbt, session):
    dbt.config(materialized="table")
    from pyspark.sql import functions as F

    from dbt_fusion_spark.plans.stats import psi_drift

    docs = dbt.ref("stg_documents")
    return psi_drift(docs.filter(F.col("doc_id") % 2 == 0),
                     docs.filter(F.col("doc_id") % 2 == 1),
                     "n_chars", bin_width=200.0)
