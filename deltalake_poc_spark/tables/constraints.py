"""CHECK constraints and NOT NULL enforcement for VersionedTable.

Delta Lake parity (``ALTER TABLE ... ADD CONSTRAINT`` /
``delta.constraints.*`` table properties): constraints are stored in
table properties as ``constraint.<name> = <sql expr>`` and enforced on
every write path (append/overwrite, MERGE, UPDATE).

Enforcement is Delta's own trick — a ``raise_error`` guard woven into
the write plan as a filter, so violations fail the write job on the
first bad row with ZERO extra Spark jobs and zero extra passes. A
separate validate-then-write pass would scan the data twice and still
race with the write; the in-plan guard does neither.

Semantics (SQL standard): a CHECK passes when the expression is TRUE
or NULL (unknown), and fails only when it evaluates to FALSE. NOT NULL
comes from the schema: fields declared ``nullable=False`` reject null
values on every write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CONSTRAINT_PREFIX = "constraint."
GENERATED_KEY = "generationExpression"


def constraints_of(properties: dict) -> dict[str, str]:
    """name -> SQL expression for every stored CHECK constraint."""
    return {
        k[len(CONSTRAINT_PREFIX):]: v
        for k, v in (properties or {}).items()
        if k.startswith(CONSTRAINT_PREFIX)
    }


def generated_of(schema: StructType | None) -> dict[str, str]:
    """column -> generation expression (Delta generated columns: the
    expression lives in the field metadata, key generationExpression)."""
    if schema is None:
        return {}
    return {
        f.name: (f.metadata or {})[GENERATED_KEY]
        for f in schema.fields
        if GENERATED_KEY in (f.metadata or {})
    }


def apply_generated(df: DataFrame, schema: StructType | None) -> DataFrame:
    """Compute generated columns ABSENT from the incoming frame (Delta
    semantics: omitted -> computed from the expression over the row's
    other columns; supplied -> kept, but validated by the equality
    guard enforce() weaves into the write plan)."""
    typed = {f.name: f.dataType for f in (schema.fields if schema else [])}
    for name, expr in generated_of(schema).items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr).cast(typed[name]))
    return df


def _violations(properties: dict, schema: StructType | None) -> list[tuple[str, Column]]:
    """(label, violated-predicate) per active constraint."""
    out: list[tuple[str, Column]] = []
    for name, expr in sorted(constraints_of(properties).items()):
        # SQL CHECK: fail only on FALSE (NULL passes) — null-safe eq
        out.append((f"CHECK constraint {name} ({expr})",
                    F.expr(expr).cast("boolean").eqNullSafe(F.lit(False))))
    for f in (schema.fields if schema is not None else []):
        if not f.nullable:
            out.append((f"NOT NULL constraint on column {f.name}",
                        F.col(f.name).isNull()))
    typed = {f.name: f.dataType for f in (schema.fields if schema else [])}
    for name, expr in generated_of(schema).items():
        # a SUPPLIED value must equal what the expression generates
        out.append((
            f"generated column {name} ({expr})",
            ~F.col(name).eqNullSafe(F.expr(expr).cast(typed[name])),
        ))
    return out


def enforce(df: DataFrame, properties: dict,
            schema: StructType | None) -> DataFrame:
    """Wrap ``df`` so that materializing it raises on the first row
    violating any CHECK / NOT NULL constraint. No-op when the table
    has no constraints (the common case costs nothing)."""
    checks = _violations(properties, schema)
    if not checks:
        return df
    if schema is not None:
        present = {f.name for f in df.schema.fields}
        missing = [f.name for f in schema.fields
                   if not f.nullable and f.name not in present]
        if missing:
            raise ValueError(
                f"write omits NOT NULL column(s) {missing}")
    guard = F.lit(True)
    for label, violated in checks:
        guard = guard & F.when(
            violated,
            F.raise_error(F.concat(
                F.lit(f"{label} violated by row "),
                F.to_json(F.struct(*[F.col(f.name) for f in df.schema.fields
                                     if not f.name.startswith("__")])))),
        ).otherwise(F.lit(True))
    return df.filter(guard)
