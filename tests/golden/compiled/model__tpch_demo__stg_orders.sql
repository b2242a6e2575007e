select
    o_orderkey,
    o_custkey,
    o_orderstatus,
    o_totalprice,
    o_orderdate,
    o_orderpriority,
    timestampadd(DAY, 30, o_orderdate) as due_date,
    split_part(o_orderpriority, '-', 1) as priority_rank
from `tpch_raw`.`orders`
