{{ config(materialized='materialized_view', on_configuration_change='apply') }}

select
    o_orderstatus,
    count(*) as n_orders,
    cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total_price
from {{ ref('stg_orders') }}
group by o_orderstatus
