"""Python model: Gopher quality signals via the engine's LLM library —
the pattern a training-data team uses to run non-SQL operators inside a
dbt DAG (reference python-model contract:
crates/dbt-schemas/src/schemas/nodes.rs model `language` field)."""


def model(dbt, session):
    dbt.config(materialized="table")
    from dbt_fusion_spark.llm import quality as Q

    docs = dbt.ref("stg_documents")
    return Q.gopher_signals(docs, "text", "doc_id")
