select o_orderkey, o_orderstatus, o_totalprice, o_orderdate
from `tpch_raw`.`orders`
where o_orderdate < CAST('1998-01-01' AS timestamp)
