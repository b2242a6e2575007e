select

    case when o_totalprice > 250000 then 'high'
         when o_totalprice > 100000 then 'mid'
         else 'low' end
 as value_band,
    count(*) as n_orders,

    -- funcsign: (string, optional[integer]) -> string
    round(sum(o_totalprice) / 100, 2)
 as total_dollars,
    cast(499705.05 as double) as corpus_max_price
from `analytics`.`stg_orders`
group by 1
