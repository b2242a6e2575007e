select o_orderkey, o_custkey, o_totalprice, o_orderdate, priority_rank
from `analytics`.`stg_orders`
