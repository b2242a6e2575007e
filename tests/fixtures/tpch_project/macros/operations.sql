{# operation macros invoked via run-operation (run-phase context:
   adapter + run_query live) #}
{% macro log_audit_event(event) %}
  {% do run_query("INSERT INTO analytics.audit_log VALUES ('" ~ event ~ "')") %}
{% endmacro %}

{% macro grant_select_all(role) %}
  {% for r in adapter.list_relations(target.schema) %}
    {% do log("granting select on " ~ r.render() ~ " to " ~ role) %}
  {% endfor %}
{% endmacro %}
