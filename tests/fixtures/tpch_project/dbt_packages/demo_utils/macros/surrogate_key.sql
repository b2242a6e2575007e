{% macro generate_surrogate_key(field_list) %}
md5(concat_ws('-', {{ field_list | join(', ') }}))
{% endmacro %}

{% macro cents_to_dollars(column_name) %}
-1 {# package version; the project macro of the same name must win #}
{% endmacro %}
