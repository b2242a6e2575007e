"""Static funcsign typechecking (reference: dbt-jinja funcsign_parser +
dbt-jinja-utils typecheck): signature parsing, call-site arity/type
diagnostics, and the conservative no-false-positive contract for
dynamic expressions. Pure-python — no Spark session needed."""

from __future__ import annotations

from dbt_fusion_spark.jinja.typecheck import (
    check_calls,
    parse_funcsigns,
    typecheck_project,
)

MACROS = """
{% macro cents_to_dollars(column_name, scale) %}
  -- funcsign: (string, integer) -> string
  round({{ column_name }} / 100, {{ scale }})
{% endmacro %}

{% macro limit_clause(n=100) %}
  -- funcsign: (optional[integer]) -> string
  limit {{ n }}
{% endmacro %}

{% macro surrogate_key(fields) %}
  -- funcsign: (list) -> string
  md5(concat_ws('|', {{ fields | join(', ') }}))
{% endmacro %}

{% macro untyped_helper(x) %}
  {{ x }}
{% endmacro %}
"""


def test_parse_signatures():
    signs = parse_funcsigns(MACROS)
    assert set(signs) == {"cents_to_dollars", "limit_clause",
                          "surrogate_key"}  # untyped_helper absent
    s = signs["cents_to_dollars"]
    assert s.param_types == ["string", "integer"]
    assert s.required == [True, True]
    assert signs["limit_clause"].required == [False]
    assert not any(s.diagnostics for s in signs.values())


def test_clean_calls_pass():
    signs = parse_funcsigns(MACROS)
    ok = """
    select {{ cents_to_dollars('amount', 2) }} as d,
           {{ cents_to_dollars(col_var, scale_var) }} as dynamic_ok
    from t {{ limit_clause() }} {{ limit_clause(n=5) }}
    {{ surrogate_key(['a', 'b']) }}
    """
    assert check_calls(ok, signs) == []


def test_arity_and_type_diagnostics():
    signs = parse_funcsigns(MACROS)
    bad = """
    {{ cents_to_dollars('amount') }}
    {{ cents_to_dollars('amount', 'two') }}
    {{ cents_to_dollars('a', 2, 3) }}
    {{ limit_clause(n='ten') }}
    {{ limit_clause(m=5) }}
    {{ surrogate_key('not_a_list') }}
    """
    problems = check_calls(bad, signs)
    assert any("missing required arg 'scale'" in p for p in problems)
    assert any("arg 'scale' is string, expected integer" in p
               for p in problems)
    assert any("3 positional args, max 2" in p for p in problems)
    assert any("arg 'n' is string, expected integer" in p for p in problems)
    assert any("unknown keyword arg 'm'" in p for p in problems)
    assert any("arg 'fields' is string, expected list" in p for p in problems)
    assert len(problems) == 6


def test_untyped_macro_is_ignored():
    signs = parse_funcsigns(MACROS)
    assert check_calls("{{ untyped_helper(1, 2, 3, 4) }}", signs) == []


def test_bad_signature_reports_not_crashes():
    signs = parse_funcsigns("""
    {% macro m(a) %}
    -- funcsign: (stringg, integer) -> string
    {{ a }}
    {% endmacro %}
    """)
    assert any("unknown type 'stringg'" in d for d in signs["m"].diagnostics)
    assert any("2 types for 1 parameters" in d
               for d in signs["m"].diagnostics)


def test_typecheck_project_walks_nodes():
    class Node:
        def __init__(self, raw):
            self.raw_code = raw

    class Proj:
        macros_src = MACROS
        nodes = {"model.x.good": Node("select {{ cents_to_dollars('a', 2) }}"),
                 "model.x.bad": Node("select {{ cents_to_dollars(2, 'a') }}")}

    problems = typecheck_project(Proj())
    assert len(problems) == 2
    assert all(p.startswith("model.x.bad:") for p in problems)
