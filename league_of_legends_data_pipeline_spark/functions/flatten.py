"""Schema-driven flattening operators (SURVEY §2.3 P1-P4).

The reference's core transformation is a recursive row-at-a-time JSON
flatten (``Utils/json.py:3-33``): BFS over nested dict/list, path segments
joined with ``_`` (``a.b[2].c`` → ``a_b_2_c``), list indices becoming
column-name components, and a substring blacklist dropping whole subtrees.

Here the same semantics are a **pure metadata operation**: we walk the
DataFrame *schema* (not the rows) and emit one ``Column`` expression per
leaf. Catalyst sees plain nested-field accesses, so nested-schema pruning
and whole-stage codegen apply; no UDF, no Python in the row path. At 100 TB
the flatten costs exactly what the projection costs — the parquet reader
only materializes referenced leaves.

Name-collision rule: the reference's dict overwrite is last-write-wins
(``Utils/json.py:31``); we keep FIRST-wins — deterministic either way, but
first-wins never silently replaces an already-projected column
(SURVEY §7 hard part 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

# Substring blacklist from Utils/json.py:28 — any flatten path containing
# one of these is dropped wholesale.
DEFAULT_BLACKLIST = ("legendaryItemUsed", "SWARM", "playerAugment", "PlayerScore")


def _walk(
    expr: Column,
    dtype: DataType,
    name: str,
    blacklist: tuple[str, ...],
    max_array: int,
    sep: str,
) -> list[tuple[str, Column]]:
    """Recurse one schema node → [(flat_name, column_expr)] leaves."""
    if any(b in name for b in blacklist):
        return []
    if isinstance(dtype, StructType):
        out: list[tuple[str, Column]] = []
        for f in dtype.fields:
            child = f"{name}{sep}{f.name}" if name else f.name
            out.extend(_walk(expr.getField(f.name), f.dataType, child,
                             blacklist, max_array, sep))
        return out
    if isinstance(dtype, ArrayType) and max_array > 0:
        # fixed positional expansion, list index as a path segment —
        # json.py:14-21 (enumerate(v) → f"{name}{sep}{i}").
        # F.get, not getItem: under ANSI mode (Spark 4 default) getItem
        # THROWS on out-of-range indices; get yields NULL — the null-pad
        # semantics of the reference's row align (Utils/sql.py:21-22)
        out = []
        for i in range(max_array):
            child = f"{name}{sep}{i}" if name else str(i)
            out.extend(_walk(F.get(expr, i), dtype.elementType, child,
                             blacklist, max_array, sep))
        return out
    return [(name, expr)]


def flatten_exprs(
    schema: StructType,
    blacklist: tuple[str, ...] = DEFAULT_BLACKLIST,
    max_array: int = 0,
    sep: str = "_",
) -> list[Column]:
    """One aliased Column per flattened leaf of ``schema``.

    ``max_array`` bounds positional array expansion (0 = arrays are kept as
    array columns, not expanded — explode them upstream; the reference only
    positionally expands the 2×≤4 perk styles, via :func:`pivot_perks`).
    First-wins on name collisions.
    """
    seen: set[str] = set()
    cols: list[Column] = []
    for f in schema.fields:
        for name, expr in _walk(F.col(f"`{f.name}`"), f.dataType, f.name,
                                blacklist, max_array, sep):
            if name not in seen:
                seen.add(name)
                cols.append(expr.alias(name))
    return cols


def flatten(
    df: DataFrame,
    blacklist: tuple[str, ...] = DEFAULT_BLACKLIST,
    max_array: int = 0,
    sep: str = "_",
) -> DataFrame:
    """Recursive flatten (P1): nested structs → ``parent_child`` scalar
    columns. Pure projection — zero row-level compute."""
    return df.select(*flatten_exprs(df.schema, blacklist, max_array, sep))


def splat_structs(df: DataFrame, *struct_cols: str, keep_clashes: bool = False) -> DataFrame:
    """Struct splat-merge (P3, ``Utils/json.py:56-70``): hoist each member of
    the named struct columns to top level (no prefix). First-wins on clash;
    ``keep_clashes`` instead keeps clashing members as ``{struct}_{member}``."""
    out_cols: list[Column] = []
    seen = {c for c in df.columns if c not in struct_cols}
    for c in df.columns:
        if c in struct_cols:
            for f in df.schema[c].dataType.fields:  # type: ignore[union-attr]
                if f.name not in seen:
                    seen.add(f.name)
                    out_cols.append(F.col(f"`{c}`.`{f.name}`").alias(f.name))
                elif keep_clashes:
                    out_cols.append(F.col(f"`{c}`.`{f.name}`").alias(f"{c}_{f.name}"))
        else:
            out_cols.append(F.col(f"`{c}`"))
    return df.select(*out_cols)


def strip_prefixes(
    df: DataFrame, prefixes: tuple[str, ...] = ("challenges_", "missions_")
) -> DataFrame:
    """Column-name prefix strip (P4, ``Lambda/lambda_function.py:236-244``):
    remove the FIRST matching prefix (first occurrence only). Collision rule
    (the reference silently dict-overwrites — Utils/json.py:31): unprefixed
    columns always keep their names; a prefixed column strips only if the
    stripped name is still free, otherwise it keeps the prefixed name.
    Deterministic and lossless."""
    def stripped(c: str) -> str:
        for p in prefixes:
            if c.startswith(p):
                return c[len(p):]
        return c

    taken = {c for c in df.columns if stripped(c) == c}
    new_names: list[str] = []
    for c in df.columns:
        name = stripped(c)
        if name != c and name in taken:
            name = c  # strip target occupied → keep prefixed name
        taken.add(name)
        new_names.append(name)
    return df.toDF(*new_names)


def pivot_perks(perks: Column, sep: str = "_") -> list[Column]:
    """Perk pivot (P2, ``Utils/json.py:35-54``): positional expansion of
    ``perks.styles[0/1].selections[i]`` into named scalar columns plus the
    ``statPerks`` struct members.

    Layout (mirroring the reference's naming):
      ``statPerks{sep}{m}``; ``Primary{sep}style``;
      ``Primary{sep}slot{sep}{i+1}{sep}{perk,var1,var2,var3}`` for i in 0..3;
      ``Secondary{sep}…`` slots 1..2.
    """
    out: list[Column] = []
    for m in ("defense", "flex", "offense"):
        out.append(perks.getField("statPerks").getField(m).alias(f"statPerks{sep}{m}"))
    for label, idx, nslots in (("Primary", 0, 4), ("Secondary", 1, 2)):
        # F.get: null-safe under ANSI mode if a style/slot is absent
        style = F.get(perks.getField("styles"), idx)
        out.append(style.getField("style").alias(f"{label}{sep}style"))
        for i in range(nslots):
            sel = F.get(style.getField("selections"), i)
            for m in ("perk", "var1", "var2", "var3"):
                out.append(sel.getField(m).alias(f"{label}{sep}slot{sep}{i + 1}{sep}{m}"))
    return out
