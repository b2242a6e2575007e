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
            # decimal(18,6): revenue is an exactly-scale-6 value rendered as
            # double, so this cast is lossless on any engine; a scale-2 cast
            # would re-round and diverge (HALF_UP vs HALF_EVEN)
            F.sum(F.col("revenue").cast("decimal(18,6)")).cast("double")
            .alias("nation_revenue"),
        )
    )
