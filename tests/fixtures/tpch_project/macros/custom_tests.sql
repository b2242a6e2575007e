{# custom generic tests via {% test %} blocks (reference parser.rs:920-933
   block tags; dbt "generic test" definitions) #}
{% test positive_values(model, column_name) %}
select {{ column_name }} from {{ model }} where {{ column_name }} <= 0
{% endtest %}

{% test within_range(model, column_name, min_value, max_value) %}
select {{ column_name }} from {{ model }}
where {{ column_name }} < {{ min_value }} or {{ column_name }} > {{ max_value }}
{% endtest %}
