{{ config(
    materialized='incremental',
    incremental_strategy='microbatch',
    event_time='o_orderdate',
    batch_size='month',
    lookback=1,
    begin='1995-01-01',
    partition_by='o_month',
) }}

select
    o_orderkey,
    o_custkey,
    o_totalprice,
    o_orderdate,
    cast(date_trunc('month', o_orderdate) as date) as o_month
from {{ ref('stg_orders') }}
