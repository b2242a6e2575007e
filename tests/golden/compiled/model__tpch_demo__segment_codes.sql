select
    c_custkey,
    segment,
    case segment


        when 'AUTOMOBILE' then 1

        when 'BUILDING' then 2

        when 'FURNITURE' then 3

        when 'HOUSEHOLD' then 4

        when 'MACHINERY' then 5


    end as seg_code
from `analytics`.`stg_customers`
