{{ config(
    materialized='incremental',
    unique_key='o_orderkey',
    incremental_strategy='merge',
    on_schema_change='append_new_columns',
) }}

select o_orderkey, o_custkey, o_totalprice, o_orderdate, priority_rank
from {{ ref('stg_orders') }}
{% if is_incremental() %}
where o_orderdate >= {{ dbt.cast(dbt.string_literal(var('cutoff')), 'timestamp') }}
{% endif %}
