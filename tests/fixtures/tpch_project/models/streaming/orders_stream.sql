{{ config(materialized='streaming_table') }}

select
    o_orderkey,
    o_custkey,
    o_totalprice,
    o_orderdate
from {{ source('tpch', 'orders') }}
where o_orderstatus = 'O'
