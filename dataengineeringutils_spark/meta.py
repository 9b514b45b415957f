"""JSON table metadata <-> Spark schema, plus conformance (ops A1-A6, B2).

The reference keeps a JSON metadata document per table — name, format,
location, columns (name/type/description), partitions — with a fixed type
vocabulary, and *imposes* it on pandas frames (cast + reorder + validate).
[R] dataengineeringutils/meta.py, datatypes.py, pd_metadata_conformance.py
(reconstructed — see SURVEY.md §0; local reference snapshot is empty).

Here the same metadata document drives Spark: ``TableMeta`` loads/serializes
the JSON shape (A1), translates the type vocabulary (A2), renders a Spark
schema/DDL (A3), and ``conform`` imposes column order and types on a
DataFrame (A4+A5) as a single narrow ``select`` — one projection node that
Catalyst folds into the scan, so conformance is free at 100 TB. ``conforms``
/ ``check_conformance`` (A6) replace the reference's raise-on-mismatch, and
``conformance_report`` gives the distributed equivalent of its row-level
validation: counts of values each column would lose under the declared cast
(via ``try_cast``), computed in one pass.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A2: fixed metadata type vocabulary -> Spark / Glue-Athena / pandas types.
# [R] dataengineeringutils/data/data_type_conversion.csv (reconstructed).
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")

_SPARK_TYPES: dict[str, T.DataType] = {
    "character": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(18, 2),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "boolean": T.BooleanType(),
    # extension vocabulary (successor packages added nested types)
    "array<float>": T.ArrayType(T.FloatType()),
    "array<character>": T.ArrayType(T.StringType()),
    "binary": T.BinaryType(),
}

_GLUE_TYPES: dict[str, str] = {
    "character": "string",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "decimal": "decimal(18,2)",
    "date": "date",
    "datetime": "timestamp",
    "boolean": "boolean",
    "array<float>": "array<float>",
    "array<character>": "array<string>",
    "binary": "binary",
}

_PANDAS_TYPES: dict[str, str] = {
    "character": "object",
    "int": "Int32",
    "long": "Int64",
    "float": "float32",
    "double": "float64",
    "decimal": "object",
    "date": "datetime64[ns]",
    "datetime": "datetime64[ns]",
    "boolean": "boolean",
}


def translate_metadata_type_to_type(col_type: str, target: str = "spark") -> Any:
    """A2: translate a metadata type name to a target type system."""
    m = _DECIMAL_RE.match(col_type)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        if target == "spark":
            return T.DecimalType(p, s)
        if target == "glue":
            return f"decimal({p},{s})"
        if target == "pandas":
            return "object"
    table = {"spark": _SPARK_TYPES, "glue": _GLUE_TYPES, "pandas": _PANDAS_TYPES}.get(target)
    if table is None:
        raise ValueError(f"unknown target type system: {target}")
    if col_type not in table:
        raise ValueError(f"unknown metadata type: {col_type!r}")
    return table[col_type]


@dataclass
class ColumnMeta:
    name: str
    type: str
    description: str = ""
    nullable: bool = True

    @property
    def spark_type(self) -> T.DataType:
        return translate_metadata_type_to_type(self.type, "spark")


@dataclass
class TableMeta:
    """A1/A3: the reference's JSON table metadata document."""

    name: str
    columns: list[ColumnMeta]
    description: str = ""
    data_format: str = "parquet"
    location: str = ""
    partitions: list[str] = field(default_factory=list)

    # -- A1: JSON round-trip ------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> TableMeta:
        cols = [
            ColumnMeta(
                name=c["name"],
                type=c["type"],
                description=c.get("description", ""),
                nullable=c.get("nullable", True),
            )
            for c in d["columns"]
        ]
        return cls(
            name=d["name"],
            columns=cols,
            description=d.get("description", ""),
            data_format=d.get("data_format", "parquet"),
            location=d.get("location", ""),
            partitions=list(d.get("partitions", [])),
        )

    @classmethod
    def from_json(cls, path: str) -> TableMeta:
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "description": self.description,
            "data_format": self.data_format,
            "location": self.location,
            "columns": [
                {"name": c.name, "type": c.type, "description": c.description}
                for c in self.columns
            ],
            "partitions": list(self.partitions),
        }

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    # -- A3: schema rendering ------------------------------------------------
    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )

    def ddl(self) -> str:
        """Column DDL for CREATE TABLE ... (glue/athena type names)."""
        cols = ", ".join(
            f"{c.name} {translate_metadata_type_to_type(c.type, 'glue')}"
            for c in self.columns
            if c.name not in self.partitions
        )
        return cols

    def create_table_sql(self, database: str | None = None) -> str:
        """A3: render a Spark-SQL CREATE TABLE from metadata (the Spark
        analogue of the reference's Glue ``TableInput`` rendering)."""
        fq = f"{database}.{self.name}" if database else self.name
        sql = f"CREATE TABLE IF NOT EXISTS {fq} ({self.ddl()}) USING {self.data_format.upper()}"
        if self.partitions:
            part_ddl = ", ".join(
                f"{c.name} {translate_metadata_type_to_type(c.type, 'glue')}"
                for c in self.columns
                if c.name in self.partitions
            )
            sql += f" PARTITIONED BY ({part_ddl})"
        if self.location:
            # metadata documents carry user-facing s3:// URIs; Spark reads
            # S3 through the Hadoop s3a connector, so the emitted DDL must
            # use the connector scheme (paths.normalize_read_path)
            from dataengineeringutils_spark.paths import normalize_read_path

            sql += f" LOCATION '{normalize_read_path(self.location)}'"
        return sql


# -- A4/A5: conformance ------------------------------------------------------
def _qcol(name: str) -> Column:
    """Column reference by LITERAL name: metadata documents may declare
    names containing dots (found by the conformance property tests —
    bare ``F.col("a.b")`` resolves as a struct-field path and fails on a
    flat column). Backtick-quote with escaping so every declared name
    resolves as itself."""
    return F.col("`" + name.replace("`", "``") + "`")


def _cast_exprs(meta: TableMeta, strict: bool) -> list[Column]:
    exprs = []
    for c in meta.columns:
        col = _qcol(c.name)
        expr = col.cast(c.spark_type) if strict else col.try_cast(c.spark_type)
        exprs.append(expr.alias(c.name))
    return exprs


def impose_column_order(df: DataFrame, meta: TableMeta) -> DataFrame:
    """A4: reorder to declared order; raise on missing columns."""
    missing = [c for c in meta.column_names if c not in df.columns]
    if missing:
        raise ValueError(f"columns missing from frame: {missing}")
    return df.select(*[_qcol(c) for c in meta.column_names])


def impose_types(df: DataFrame, meta: TableMeta, strict: bool = True) -> DataFrame:
    """A5: cast every declared column. ``strict`` keeps ANSI cast (errors on
    bad values, matching the reference's raise); ``strict=False`` uses
    try_cast (bad values -> NULL, surfaced by ``conformance_report``)."""
    return df.select(*_cast_exprs(meta, strict))


def conform(df: DataFrame, meta: TableMeta, strict: bool = True) -> DataFrame:
    """A4+A5 in one projection (column order + declared types)."""
    return impose_types(impose_column_order(df, meta), meta, strict=strict)


def conforms(df: DataFrame, meta: TableMeta) -> bool:
    """A6: does the frame already match the declared schema exactly?"""
    declared = [(f.name, f.dataType) for f in meta.spark_schema().fields]
    actual = [(f.name, f.dataType) for f in df.schema.fields]
    return declared == actual


def check_conformance(df: DataFrame, meta: TableMeta) -> None:
    """A6 strict form: raise with a diff when the frame does not conform."""
    if not conforms(df, meta):
        declared = meta.spark_schema().simpleString()
        actual = df.schema.simpleString()
        raise ValueError(f"schema does not conform.\ndeclared: {declared}\nactual:   {actual}")


def conformance_report(df: DataFrame, meta: TableMeta) -> DataFrame:
    """Distributed validation report: for each declared column, how many
    values would be lost by the declared cast (non-null -> null under
    try_cast). One aggregate pass; replaces the reference's row-level
    pandas validation at scale."""
    aggs = []
    for c in meta.columns:
        if c.name not in df.columns:
            continue
        src = _qcol(c.name)
        bad = F.sum(
            (src.isNotNull() & src.try_cast(c.spark_type).isNull()).cast("long")
        ).alias(f"{c.name}_cast_failures")
        aggs.append(bad)
    return df.agg(*aggs)
