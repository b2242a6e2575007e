"""Column abstraction + dbt-style type translation for Spark.

Re-expresses the reference's adapter Column
(crates/dbt-adapter/src/column/mod.rs:126-236: translate_type :187,
numeric_type :209, string_type :220, is_string/is_numeric/can_expand_to)
and the user-declared DbtColumn
(crates/dbt-schemas/src/schemas/dbt_column.rs:37-51) against
pyspark.sql.types.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# dbt generic type name -> Spark SQL type string
# (reference column/mod.rs:187 translate_type; dbt-spark conventions)
_TRANSLATE = {
    "text": "string",
    "character varying": "string",
    "varchar": "string",
    "string": "string",
    "char": "string",
    "integer": "int",
    "int": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "float": "float",
    "float8": "double",
    "double precision": "double",
    "double": "double",
    "real": "float",
    "numeric": "decimal",
    "decimal": "decimal",
    "bool": "boolean",
    "boolean": "boolean",
    "timestamp without time zone": "timestamp",
    "timestamp": "timestamp",
    "date": "date",
    "binary": "binary",
}

_DECIMAL_RE = re.compile(r"^(?:numeric|decimal)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", re.I)
_VARCHAR_RE = re.compile(r"^(?:varchar|char|character varying)\s*\(\s*(\d+)\s*\)$", re.I)


def translate_type(dtype: str) -> str:
    """dbt/ANSI type name -> Spark SQL type string."""
    s = dtype.strip().lower()
    m = _DECIMAL_RE.match(s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = _VARCHAR_RE.match(s)
    if m:
        return "string"  # Spark strings are unbounded
    return _TRANSLATE.get(s, s)


def spark_type(dtype: str) -> T.DataType:
    """Spark SQL type string -> DataType object (via DDL parser)."""
    return T._parse_datatype_string(translate_type(dtype))


@dataclass
class Column:
    """Adapter column (reference column/mod.rs:126-236)."""

    name: str
    dtype: str
    char_size: int | None = None
    numeric_precision: int | None = None
    numeric_scale: int | None = None

    @classmethod
    def from_description(cls, name: str, raw_data_type: str) -> Column:
        s = raw_data_type.strip().lower()
        m = _DECIMAL_RE.match(s)
        if m:
            return cls(name, "decimal", None, int(m.group(1)), int(m.group(2)))
        m = _VARCHAR_RE.match(s)
        if m:
            return cls(name, "string", int(m.group(1)))
        return cls(name, translate_type(s))

    @classmethod
    def from_struct_field(cls, f: T.StructField) -> Column:
        dt = f.dataType
        if isinstance(dt, T.DecimalType):
            return cls(f.name, "decimal", None, dt.precision, dt.scale)
        return cls(f.name, dt.simpleString())

    @property
    def quoted(self) -> str:
        return "`" + self.name.replace("`", "``") + "`"

    @property
    def data_type(self) -> str:
        if self.is_numeric() and self.numeric_precision is not None:
            return f"decimal({self.numeric_precision},{self.numeric_scale or 0})"
        return self.dtype

    def is_string(self) -> bool:
        return translate_type(self.dtype) == "string"

    def is_numeric(self) -> bool:  # exact numerics (reference :209)
        return translate_type(self.dtype).startswith("decimal")

    def is_float(self) -> bool:
        return translate_type(self.dtype) in ("float", "double")

    def is_integer(self) -> bool:
        return translate_type(self.dtype) in ("tinyint", "smallint", "int", "bigint")

    def string_size(self) -> int:
        if not self.is_string():
            raise ValueError(f"{self.name} is not a string column")
        return self.char_size or 16777216

    def can_expand_to(self, other: Column) -> bool:
        """True if self can be widened to other (strings only, like the
        reference's default; Spark strings are unbounded so always True
        for string→string)."""
        return self.is_string() and other.is_string()

    @staticmethod
    def numeric_type(dtype: str, precision: int | None, scale: int | None) -> str:
        if precision is None or scale is None:
            return dtype
        return f"decimal({precision},{scale})"

    @staticmethod
    def string_type(size: int | None = None) -> str:
        return "string"
