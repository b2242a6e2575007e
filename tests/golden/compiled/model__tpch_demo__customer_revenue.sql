WITH __dbt__cte__order_lines AS (
select
    l_orderkey,
    cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(8,4)))
        as net_price
from `tpch_raw`.`lineitem`
)
select
    c.c_custkey,
    any_value(c.c_name) as c_name,
    any_value(c.segment) as segment,
    cast(sum(ol.net_price) as double) as revenue,
    count(distinct o.o_orderkey) as n_orders
from `analytics`.`stg_customers` c
join `analytics`.`stg_orders` o on c.c_custkey = o.o_custkey
join __dbt__cte__order_lines ol on ol.l_orderkey = o.o_orderkey
group by c.c_custkey
