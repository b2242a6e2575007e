select
    o_orderkey,
    o_custkey,
    o_orderstatus,
    o_totalprice,
    o_orderdate,
    o_orderpriority,
    {{ dbt.dateadd('day', 30, 'o_orderdate') }} as due_date,
    {{ dbt.split_part('o_orderpriority', "'-'", 1) }} as priority_rank
from {{ source('tpch', 'orders') }}
