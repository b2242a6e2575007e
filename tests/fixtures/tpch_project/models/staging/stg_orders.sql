select
    o_orderkey,
    o_custkey,
    o_orderstatus,
    o_totalprice,
    o_orderdate,
    o_orderpriority,
    {{ dbt.dateadd('day', due_days(), 'o_orderdate') }} as due_date,
    {{ dbt.split_part('o_orderpriority', "'-'", 1) }} as priority_rank
from {{ source('tpch', 'orders') }}
