{{ config(materialized='table') }}

{#- classic dbt introspection pattern (dbt_utils.get_column_values):
    run a query at compile time via the statement protocol, iterate the
    agate result to generate SQL. ORDER BY makes codes deterministic.
    `execute` guards the result walk — at parse time statements don't
    run and load_result returns none (dbt contract). -#}
{% call statement('segs', fetch_result=True) %}
    select distinct segment from {{ ref('stg_customers') }} order by segment
{% endcall %}

select
    c_custkey,
    segment,
    case segment
{% if execute %}
{% for row in load_result('segs').table.rows %}
        when '{{ row[0] }}' then {{ loop.index }}
{% endfor %}
{% endif %}
    end as seg_code
from {{ ref('stg_customers') }}
