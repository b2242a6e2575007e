select
    o_orderkey,
    o_custkey,
    o_totalprice,
    o_orderdate,
    cast(date_trunc('month', o_orderdate) as date) as o_month
from `analytics`.`stg_orders`
