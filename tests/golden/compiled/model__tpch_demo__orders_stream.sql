select
    o_orderkey,
    o_custkey,
    o_totalprice,
    o_orderdate
from `tpch_raw`.`orders`
where o_orderstatus = 'O'
