"""Static typechecking of Jinja macro calls via `-- funcsign:` comments.

Reference semantics: crates/dbt-jinja/minijinja/src/types/
funcsign_parser.rs (signature comment grammar) and
crates/dbt-jinja-utils/src/typecheck.rs (call-site validation). A macro
author annotates the macro body with a signature comment:

    {% macro cents_to_dollars(column_name, scale) %}
      -- funcsign: (string, integer) -> string
      ...
    {% endmacro %}

and `typecheck_project` validates every direct call site statically —
before any SQL runs. The checks are deliberately conservative (no false
positives on dynamic code):

- arity: too many positional args, or missing required params (a param
  with a Jinja default, or an `optional[...]` type, is not required);
- unknown keyword arguments;
- literal argument types: a literal that is definitely a string/
  integer/float/bool/list/dict is checked against the declared type;
  any non-literal expression types as `any` and always passes.

Types: string, integer, float, number (int|float), bool, list, dict,
relation, column, any, optional[T], and `...` (varargs tail).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_MACRO_RE = re.compile(
    r"{%-?\s*macro\s+(\w+)\s*\((.*?)\)\s*-?%}(.*?){%-?\s*endmacro\s*-?%}",
    re.DOTALL,
)
_FUNCSIGN_RE = re.compile(
    r"(?:--|\#)\s*funcsign:\s*\((.*?)\)\s*->\s*([\w\[\]\.]+)")

_KNOWN_TYPES = {"string", "integer", "float", "number", "bool", "list",
                "dict", "relation", "column", "any", "..."}


@dataclass
class FuncSign:
    name: str
    param_names: list[str]
    param_types: list[str]          # normalized, aligned to param_names
    required: list[bool]
    varargs: bool = False
    return_type: str = "any"
    diagnostics: list[str] = field(default_factory=list)


def _norm_type(t: str) -> tuple[str, bool]:
    """-> (base_type, optional)"""
    t = t.strip().lower()
    opt = False
    m = re.fullmatch(r"optional\[(.+)\]", t)
    if m:
        opt, t = True, m.group(1).strip()
    return t, opt


def parse_funcsigns(macros_src: str) -> dict[str, FuncSign]:
    """Extract signatures for every annotated macro in the concatenated
    macro source. Unannotated macros are absent (callers type as any)."""
    signs: dict[str, FuncSign] = {}
    for m in _MACRO_RE.finditer(macros_src):
        name, params_src, body = m.group(1), m.group(2), m.group(3)
        fs = _FUNCSIGN_RE.search(body)
        if not fs:
            continue
        # macro params: name or name=default
        pnames, pdefault = [], []
        for p in _split_top(params_src):
            if not p.strip():
                continue
            pn, _, default = p.partition("=")
            pnames.append(pn.strip())
            pdefault.append(bool(default.strip()))
        types_src = [t for t in _split_top(fs.group(1)) if t.strip()]
        sign = FuncSign(name=name, param_names=pnames, param_types=[],
                        required=[], return_type=fs.group(2).strip().lower())
        varargs = False
        norm: list[tuple[str, bool]] = []
        for t in types_src:
            base, opt = _norm_type(t)
            if base == "...":
                varargs = True
                continue
            if base not in _KNOWN_TYPES:
                sign.diagnostics.append(
                    f"macro {name}: unknown type {base!r} in funcsign")
                base = "any"
            norm.append((base, opt))
        if len(norm) > len(pnames):
            sign.diagnostics.append(
                f"macro {name}: funcsign lists {len(norm)} types for "
                f"{len(pnames)} parameters")
            norm = norm[:len(pnames)]
        while len(norm) < len(pnames):
            norm.append(("any", True))
        sign.param_types = [b for b, _ in norm]
        sign.required = [not (opt or has_def)
                         for (_, opt), has_def in zip(norm, pdefault)]
        sign.varargs = varargs
        signs[name] = sign
    return signs


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (paren/bracket/quote aware)."""
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


_INT_RE = re.compile(r"[+-]?\d+")
_FLOAT_RE = re.compile(r"[+-]?\d+\.\d*([eE][+-]?\d+)?")
_STR_RE = re.compile(r"('([^'\\]|\\.)*'|\"([^\"\\]|\\.)*\")")


def _literal_type(expr: str) -> str:
    """Conservative literal classification; anything dynamic -> any."""
    e = expr.strip()
    if _STR_RE.fullmatch(e):
        return "string"
    if _FLOAT_RE.fullmatch(e):
        return "float"
    if _INT_RE.fullmatch(e):
        return "integer"
    if e.lower() in ("true", "false"):
        return "bool"
    if e.lower() in ("none", "null"):
        return "none"
    if e.startswith("["):
        return "list"
    if e.startswith("{"):
        return "dict"
    return "any"


def _compatible(lit: str, declared: str, optional: bool) -> bool:
    if lit == "any" or declared == "any":
        return True
    if lit == "none":
        return optional
    if declared == "number":
        return lit in ("integer", "float")
    if declared == "float":
        return lit in ("integer", "float")
    if declared in ("relation", "column"):
        return lit == "string" or lit == "any"  # name-as-string is idiomatic
    return lit == declared


_JINJA_EXPR_RE = re.compile(r"{{(.*?)}}|{%(.*?)%}", re.DOTALL)


def check_calls(src: str, signs: dict[str, FuncSign]) -> list[str]:
    """Diagnostics for every direct `name(...)` call of an annotated
    macro inside Jinja expression/statement blocks of `src`."""
    problems: list[str] = []
    for m in _JINJA_EXPR_RE.finditer(src):
        block = m.group(1) or m.group(2) or ""
        for name, sign in signs.items():
            for call in re.finditer(rf"(?<![\w.]){name}\s*\(", block):
                args_src = _balanced_args(block, call.end())
                if args_src is None:
                    continue
                problems += _check_one(sign, args_src)
    return problems


def _balanced_args(s: str, start: int) -> str | None:
    depth, i, q = 1, start, None
    while i < len(s):
        ch = s[i]
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[start:i]
        i += 1
    return None


def _check_one(sign: FuncSign, args_src: str) -> list[str]:
    problems: list[str] = []
    pos: list[str] = []
    kw: dict[str, str] = {}
    for a in _split_top(args_src):
        if not a.strip():
            continue
        mm = re.match(r"\s*(\w+)\s*=(?!=)(.*)", a, re.DOTALL)
        if mm:  # ident= is always a kwarg in a Jinja call
            kw[mm.group(1)] = mm.group(2)
        else:
            pos.append(a)
    n_params = len(sign.param_names)
    if len(pos) > n_params and not sign.varargs:
        problems.append(
            f"{sign.name}: {len(pos)} positional args, max {n_params}")
    for k in kw:
        if k not in sign.param_names:
            problems.append(f"{sign.name}: unknown keyword arg {k!r}")
    for i, pname in enumerate(sign.param_names):
        supplied = pos[i] if i < len(pos) else kw.get(pname)
        if supplied is None:
            if sign.required[i]:
                problems.append(
                    f"{sign.name}: missing required arg {pname!r}")
            continue
        declared = sign.param_types[i]
        lit = _literal_type(supplied)
        if not _compatible(lit, declared, optional=not sign.required[i]):
            problems.append(
                f"{sign.name}: arg {pname!r} is {lit}, expected {declared}")
    return problems


def typecheck_project(project) -> list[str]:
    """Typecheck every model/snapshot/test raw code plus macro bodies
    against the project's funcsign-annotated macros. Returns
    diagnostics (empty = clean)."""
    signs = parse_funcsigns(project.macros_src)
    problems: list[str] = []
    for sign in signs.values():
        problems += sign.diagnostics
    if not signs:
        return problems
    problems += [f"macros: {p}" for p in check_calls(project.macros_src,
                                                     signs)]
    for uid, node in sorted(project.nodes.items()):
        raw = getattr(node, "raw_code", "") or ""
        problems += [f"{uid}: {p}" for p in check_calls(raw, signs)]
    return problems
