"""Python model: exact duplicate-substring removal (Lee et al. 2022)
over the quality-filtered mart — the cleaning pass after filtering,
composed in the same dbt DAG (reference python-model contract:
crates/dbt-schemas/src/schemas/nodes.rs model `language` field)."""


def model(dbt, session):
    dbt.config(materialized="table")
    from dbt_fusion_spark.llm.dedup import remove_duplicate_spans

    docs = dbt.ref("clean_docs")
    return remove_duplicate_spans(docs, "doc_id", "text", k=10)
