{# exercises project macros + the statement call-block protocol #}
{% call statement('max_price', fetch_result=True) %}
    select max(o_totalprice) as max_price from {{ ref('stg_orders') }}
{% endcall %}
{% set max_price = load_result('max_price')['data'][0][0] if execute else 0 %}

select
    {{ order_value_band('o_totalprice') }} as value_band,
    count(*) as n_orders,
    {{ cents_to_dollars('sum(o_totalprice)') }} as total_dollars,
    cast({{ max_price }} as double) as corpus_max_price
from {{ ref('stg_orders') }}
group by 1
