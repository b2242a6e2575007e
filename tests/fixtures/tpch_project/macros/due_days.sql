{# default due window; unit tests override this macro (dbt 1.8
   unit-test `overrides: macros:`) #}
{% macro due_days() %}30{% endmacro %}
