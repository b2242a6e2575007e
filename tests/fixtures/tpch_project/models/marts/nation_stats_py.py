"""Python model: native DataFrame logic (dbt python-model contract)."""


def model(dbt, session):
    dbt.config(materialized="table")
    import pyspark.sql.functions as F

    customers = dbt.ref("stg_customers")
    revenue = dbt.ref("customer_revenue")
    return (
        customers.join(revenue, "c_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double")
            .alias("nation_revenue"),
        )
    )
