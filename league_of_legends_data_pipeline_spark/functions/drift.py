"""Schema drift detection + quarantine (SURVEY §7 hard part 1).

The reference tolerates arbitrary new fields by ALTERing the table at
insert time (``Utils/sql.py:10-19``) — silent, unbounded schema growth.
This module is the governed alternative for the silver layer: diff the
observed (inferred) schema against the declared one, conform rows to the
declared schema (casting drifted types, null-padding missing fields), and
preserve undeclared fields in a single JSON quarantine column instead of
letting them mutate the table.

Both operations are metadata walks + one projection — no shuffle, no UDF;
at 100 TB conforming costs the same as any column select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

QUARANTINE_COL = "_quarantine"


def _leaf_paths(schema: DataType, prefix: str = "") -> dict[str, str]:
    """Flatten a (possibly nested) schema to dotted leaf paths → type
    strings. Arrays contribute their element schema under ``path[]``."""
    out: dict[str, str] = {}
    if isinstance(schema, StructType):
        for f in schema.fields:
            out.update(_leaf_paths(f.dataType, f"{prefix}{f.name}."))
    elif isinstance(schema, ArrayType):
        out.update(_leaf_paths(schema.elementType, f"{prefix[:-1]}[]."))
    else:
        out[prefix[:-1]] = schema.simpleString()
    return out


def schema_drift(observed: StructType, declared: StructType) -> dict[str, list[str]]:
    """Diff two schemas at leaf-path granularity.

    Returns ``{"added": [...], "missing": [...], "changed": [...]}`` —
    paths only the observed schema has, paths only the declared one has,
    and paths present in both with differing types (the INT→BIGINT
    promotions the reference handles ad hoc at ``Utils/sql.py:49-52``
    show up here instead of silently widening the table).
    """
    o, d = _leaf_paths(observed), _leaf_paths(declared)
    return {
        "added": sorted(set(o) - set(d)),
        "missing": sorted(set(d) - set(o)),
        "changed": sorted(f"{p}: {d[p]} -> {o[p]}"
                          for p in set(o) & set(d) if o[p] != d[p]),
    }


def conform(df: DataFrame, declared: StructType,
            quarantine_col: str = QUARANTINE_COL) -> DataFrame:
    """Project ``df`` onto the declared top-level schema.

    - declared column present: cast to the declared type (drifted numeric
      widths conform instead of failing the write);
    - declared column absent: null of the declared type (the reference's
      ``align_row_data`` null-padding, ``Utils/sql.py:21-22``);
    - observed-but-undeclared columns: packed into ONE JSON string column
      so nothing is lost and nothing mutates the table schema — the
      quarantine is queryable later with ``get_json_object`` and can be
      re-processed once the field is promoted to the declared schema.
    """
    declared_names = {f.name for f in declared.fields}
    unknown = [c for c in df.columns if c not in declared_names]
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in df.columns
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in declared.fields
    ]
    q = (F.to_json(F.struct(*[F.col(c) for c in unknown])) if unknown
         else F.lit(None).cast("string"))
    return df.select(*cols, q.alias(quarantine_col))
