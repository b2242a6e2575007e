"""Python model: MOSS-style winnow near-dup candidate pairs over the
quality-filtered mart — the near-dup audit table a dedup decision
feeds from, downstream of the same DAG."""


def model(dbt, session):
    dbt.config(materialized="table")
    from dbt_fusion_spark.llm.text import winnow_candidate_pairs

    docs = dbt.ref("clean_docs")
    return winnow_candidate_pairs(docs, "doc_id", "text",
                                  k=3, window=4, max_df=1000,
                                  min_shared=2)
