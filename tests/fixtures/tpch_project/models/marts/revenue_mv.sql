{{ config(materialized='materialized_view', on_configuration_change='apply') }}

select
    o_orderstatus,
    count(*) as n_orders,
    sum(o_totalprice) as total_price
from {{ ref('stg_orders') }}
group by o_orderstatus
