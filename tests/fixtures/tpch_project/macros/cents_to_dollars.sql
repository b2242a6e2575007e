{# project macro (reference fixture analog:
   crates/dbt-init/assets/jaffle_shop/macros/cents_to_dollars.sql) #}
{% macro cents_to_dollars(column_name, scale=2) %}
    -- funcsign: (string, optional[integer]) -> string
    round({{ column_name }} / 100, {{ scale }})
{% endmacro %}

{% macro order_value_band(col) %}
    case when {{ col }} > 250000 then 'high'
         when {{ col }} > 100000 then 'mid'
         else 'low' end
{% endmacro %}
