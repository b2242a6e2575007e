select
    l_orderkey,
    cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(8,4)))
        as net_price
from `tpch_raw`.`lineitem`
