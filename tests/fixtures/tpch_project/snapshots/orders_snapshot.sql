{% snapshot orders_snapshot %}
{{ config(
    unique_key='o_orderkey',
    strategy='timestamp',
    updated_at='o_orderdate',
) }}
select o_orderkey, o_orderstatus, o_totalprice, o_orderdate
from {{ source('tpch', 'orders') }}
where o_orderdate < {{ dbt.cast(dbt.string_literal(var('cutoff')), 'timestamp') }}
{% endsnapshot %}
