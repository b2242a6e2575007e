select
    o_orderstatus,
    count(*) as n_orders,
    cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total_price
from `analytics`.`stg_orders`
group by o_orderstatus
