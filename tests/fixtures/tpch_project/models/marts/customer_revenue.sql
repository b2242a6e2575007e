{{ config(pre_hook="select 1",
          persist_docs={'relation': true, 'columns': true},
          grants={'select': ['analyst_role', 'bi_role']}) }}

select
    c.c_custkey,
    any_value(c.c_name) as c_name,
    any_value(c.segment) as segment,
    cast(sum(ol.net_price) as double) as revenue,
    count(distinct o.o_orderkey) as n_orders
from {{ ref('stg_customers') }} c
join {{ ref('stg_orders') }} o on c.c_custkey = o.o_custkey
join {{ ref('order_lines') }} ol on ol.l_orderkey = o.o_orderkey
group by c.c_custkey
