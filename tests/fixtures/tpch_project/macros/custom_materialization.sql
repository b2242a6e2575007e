{# custom materialization via {% materialization %} block — the body
   receives `sql` (compiled model SELECT) and `this`, and runs its own
   DDL through the statement protocol #}
{% materialization ctas_sorted, default %}
  {% call statement('drop') %}
    DROP TABLE IF EXISTS {{ this }}
  {% endcall %}
  {% call statement('main') %}
    CREATE TABLE {{ this }} AS {{ sql }}
  {% endcall %}
{% endmaterialization %}
